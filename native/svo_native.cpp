// voxtracer native runtime: hash-consed sparse voxel octree builder/editor.
//
// This is the C++ counterpart of voxtracer/world/svo.py (behavioral spec:
// the reference's Rust svo.rs + worldgen.rs, rebuilt): an interned,
// reference-counted octree DAG with slot reuse, a bulk terrain builder
// (min/max heightmap pyramid -> collapsed octree), point edits with
// path copying, and serialization to the flat uint32[N][8] device table.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment). All
// node ids are u32 slot indices; EMPTY = 0xFFFFFFFF.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libvoxsvo.so svo_native.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>

namespace {

constexpr uint32_t EMPTY = 0xFFFFFFFFu;

enum Kind : uint8_t { FREE = 0, BLOCK = 1, CHILDREN = 2 };

struct Node {
    uint32_t payload[8]; // BLOCK: rgb f32 bits in [0..3); CHILDREN: child ids
    uint32_t refcount;
    uint32_t level;
    Kind kind;
};

static inline uint64_t mix64(uint64_t h) {
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33; h *= 0xc4ceb9fe1a85ec53ULL;
    h ^= h >> 33; return h;
}

static inline uint64_t node_hash(Kind kind, const uint32_t* payload) {
    uint64_t h = kind == BLOCK ? 0x9e3779b97f4a7c15ULL : 0x2545f4914f6cdd1dULL;
    int n = kind == BLOCK ? 3 : 8;
    for (int i = 0; i < n; i++) h = mix64(h ^ payload[i]);
    return h | 1; // never 0 (0 marks an empty hash slot)
}

// Open-addressing intern table: slot -> (hash, node id).
struct InternTable {
    std::vector<uint64_t> hashes;
    std::vector<uint32_t> ids;
    size_t count = 0;

    InternTable() { rehash(1 << 16); }

    void rehash(size_t cap) {
        std::vector<uint64_t> oh = std::move(hashes);
        std::vector<uint32_t> oi = std::move(ids);
        hashes.assign(cap, 0);
        ids.assign(cap, 0);
        count = 0;
        // re-inserted by caller via rebuild (only used by Space::rehash_all)
        (void)oh; (void)oi;
    }
};

struct Space {
    std::vector<Node> nodes;
    std::vector<int32_t> solidv;   // maintained uniform solid-leaf id | -1
    std::vector<uint32_t> free_slots;
    std::vector<uint32_t> dirty;   // slots changed since last serialize
    bool synced = false;           // a baseline full serialize exists
    uint32_t root = EMPTY;

    // intern map
    std::vector<uint64_t> h_hash;
    std::vector<uint32_t> h_id;
    size_t h_count = 0;

    Space() { h_hash.assign(1 << 16, 0); h_id.assign(1 << 16, 0); }

    size_t hmask() const { return h_hash.size() - 1; }

    bool node_equals(uint32_t id, Kind kind, const uint32_t* payload) const {
        const Node& n = nodes[id];
        if (n.kind != kind) return false;
        int c = kind == BLOCK ? 3 : 8;
        return std::memcmp(n.payload, payload, c * 4) == 0;
    }

    void grow_hash() {
        std::vector<uint64_t> oh = std::move(h_hash);
        std::vector<uint32_t> oi = std::move(h_id);
        h_hash.assign(oh.size() * 2, 0);
        h_id.assign(oh.size() * 2, 0);
        for (size_t s = 0; s < oh.size(); s++) {
            if (!oh[s]) continue;
            size_t i = oh[s] & hmask();
            while (h_hash[i]) i = (i + 1) & hmask();
            h_hash[i] = oh[s];
            h_id[i] = oi[s];
        }
    }

    uint32_t alloc(Kind kind, const uint32_t* payload, uint32_t level) {
        uint32_t id;
        if (!free_slots.empty()) {
            id = free_slots.back();
            free_slots.pop_back();
        } else {
            id = (uint32_t)nodes.size();
            nodes.emplace_back();
            solidv.push_back(-1);
        }
        Node& n = nodes[id];
        std::memset(n.payload, 0, sizeof n.payload);
        std::memcpy(n.payload, payload, (kind == BLOCK ? 3 : 8) * 4);
        n.refcount = 0;
        n.level = level;
        n.kind = kind;
        if (synced) dirty.push_back(id);
        return id;
    }

    // Intern a cell; bumps child refcounts on first insert (svo.rs:47-68).
    uint32_t create(Kind kind, const uint32_t* payload) {
        if (kind == CHILDREN) {
            bool all_empty = true;
            for (int i = 0; i < 8; i++) all_empty &= payload[i] == EMPTY;
            if (all_empty) return EMPTY;
        }
        uint64_t h = node_hash(kind, payload);
        size_t i = h & hmask();
        while (h_hash[i]) {
            if (h_hash[i] == h && node_equals(h_id[i], kind, payload))
                return h_id[i];
            i = (i + 1) & hmask();
        }
        uint32_t level = 0;
        if (kind == CHILDREN) {
            for (int c = 0; c < 8; c++) {
                if (payload[c] != EMPTY) {
                    nodes[payload[c]].refcount++;
                    level = std::max(level, nodes[payload[c]].level + 1);
                }
            }
        }
        uint32_t id = alloc(kind, payload, level);
        if (kind == BLOCK) {
            solidv[id] = (int32_t)id;
        } else {
            // children are immutable once interned, so the solid-leaf id
            // is computable at creation and never revisited
            int32_t sl = payload[0] == EMPTY ? -1 : solidv[payload[0]];
            bool ok = sl >= 0;
            for (int c = 1; ok && c < 8; c++)
                ok = payload[c] != EMPTY && solidv[payload[c]] == sl;
            solidv[id] = ok ? sl : -1;
        }
        h_hash[i] = h;
        h_id[i] = id;
        h_count++;
        if (h_count * 4 > h_hash.size() * 3) grow_hash();
        return id;
    }

    void hash_remove(uint32_t id) {
        uint64_t h = node_hash(nodes[id].kind, nodes[id].payload);
        size_t i = h & hmask();
        while (h_hash[i]) {
            if (h_hash[i] == h && h_id[i] == id) break;
            i = (i + 1) & hmask();
        }
        if (!h_hash[i]) return; // not interned (should not happen)
        // Robin-hood-free deletion: re-insert the cluster after the hole.
        h_hash[i] = 0;
        h_count--;
        size_t j = (i + 1) & hmask();
        while (h_hash[j]) {
            uint64_t hh = h_hash[j];
            uint32_t ii = h_id[j];
            h_hash[j] = 0;
            size_t k = hh & hmask();
            while (h_hash[k]) k = (k + 1) & hmask();
            h_hash[k] = hh;
            h_id[k] = ii;
            j = (j + 1) & hmask();
        }
    }

    void decr(uint32_t id) {
        // iterative to avoid deep recursion on tall solid-cube chains
        std::vector<uint32_t> stack{id};
        while (!stack.empty()) {
            uint32_t n = stack.back();
            stack.pop_back();
            if (--nodes[n].refcount != 0) continue;
            hash_remove(n);
            if (nodes[n].kind == CHILDREN) {
                for (int c = 0; c < 8; c++)
                    if (nodes[n].payload[c] != EMPTY)
                        stack.push_back(nodes[n].payload[c]);
            }
            nodes[n].kind = FREE;
            solidv[n] = -1;
            free_slots.push_back(n);
            if (synced) dirty.push_back(n);
        }
    }

    void set_root(uint32_t node) {
        if (node != EMPTY) nodes[node].refcount++;
        if (root != EMPTY) decr(root);
        root = node;
    }

    uint32_t height() const {
        return root == EMPTY ? 0 : nodes[root].level;
    }
};

struct MinMax { uint32_t mn, mx; };

} // namespace

extern "C" {

void* vx_new() { return new Space(); }
void vx_free(void* h) { delete (Space*)h; }

uint32_t vx_capacity(void* h) { return (uint32_t)((Space*)h)->nodes.size(); }
uint32_t vx_num_nodes(void* h) {
    Space* s = (Space*)h;
    return (uint32_t)(s->nodes.size() - s->free_slots.size());
}
uint32_t vx_root(void* h) { return ((Space*)h)->root; }
uint32_t vx_height(void* h) { return ((Space*)h)->height(); }
uint64_t vx_mem_usage(void* h) {
    Space* s = (Space*)h;
    return s->nodes.size() * sizeof(Node) + s->h_hash.size() * 12;
}

// Bulk terrain build: heights is a [size][size] row-major array indexed
// [x][z] of column heights in [0, size]; size = 1 << log2_size. Builds the
// min/max pyramid and emits the collapsed octree (worldgen.rs:26-96
// semantics). Returns the new root.
uint32_t vx_build_terrain(void* h, const uint32_t* heights, int log2_size,
                          float r, float g, float b) {
    Space* s = (Space*)h;
    const uint32_t size = 1u << log2_size;

    // pyramid[l]: dim = size >> l
    std::vector<std::vector<MinMax>> pyr(log2_size + 1);
    pyr[0].resize((size_t)size * size);
    for (size_t i = 0; i < (size_t)size * size; i++)
        pyr[0][i] = {heights[i], heights[i]};
    for (int l = 1; l <= log2_size; l++) {
        uint32_t dim = size >> l, pdim = size >> (l - 1);
        pyr[l].resize((size_t)dim * dim);
        for (uint32_t x = 0; x < dim; x++)
            for (uint32_t z = 0; z < dim; z++) {
                MinMax m{UINT32_MAX, 0};
                for (int dx = 0; dx < 2; dx++)
                    for (int dz = 0; dz < 2; dz++) {
                        MinMax c = pyr[l - 1][(size_t)(2 * x + dx) * pdim + 2 * z + dz];
                        m.mn = std::min(m.mn, c.mn);
                        m.mx = std::max(m.mx, c.mx);
                    }
                pyr[l][(size_t)x * dim + z] = m;
            }
    }

    // solid-cube chain (Block wrapped per level)
    uint32_t rgb[3];
    float col[3] = {r, g, b};
    std::memcpy(rgb, col, 12);
    std::vector<uint32_t> solid(log2_size + 1);
    solid[0] = s->create(BLOCK, rgb);
    for (int l = 1; l <= log2_size; l++) {
        uint32_t ch[8];
        for (int i = 0; i < 8; i++) ch[i] = solid[l - 1];
        solid[l] = s->create(CHILDREN, ch);
    }

    // bottom-up mixed-cell interning, level by level. The previous
    // level's mixed-cell ids are addressed O(1) by (column offset + cy -
    // column lo): cells per column form one contiguous cy range.
    std::vector<uint32_t> prev_ids;
    std::vector<uint32_t> prev_lo;   // per child column: first mixed cy
    std::vector<size_t> prev_off;    // per child column: offset into ids

    for (int level = 1; level <= log2_size; level++) {
        const uint32_t cs = 1u << level;       // cell size
        const uint32_t dim = size >> level;    // cells per axis
        const uint32_t cdim = dim * 2;         // child cells per axis
        const uint32_t s2 = cs >> 1;
        const auto& pm = pyr[level];
        const auto& pc = pyr[level - 1];

        std::vector<uint32_t> ids;
        std::vector<uint32_t> los((size_t)dim * dim);
        std::vector<size_t> offs((size_t)dim * dim + 1);

        for (uint32_t cx = 0; cx < dim; cx++)
            for (uint32_t cz = 0; cz < dim; cz++) {
                size_t col = (size_t)cx * dim + cz;
                MinMax m = pm[col];
                uint32_t lo = std::min(m.mn / cs, dim);
                uint32_t hi = std::min((m.mx + cs - 1) / cs, dim);
                los[col] = lo;
                offs[col] = ids.size();
                for (uint32_t cy = lo; cy < hi; cy++) {
                    uint32_t ch[8];
                    for (int oz = 0; oz < 2; oz++)
                        for (int oy = 0; oy < 2; oy++)
                            for (int ox = 0; ox < 2; ox++) {
                                int ci = ox | (oy << 1) | (oz << 2);
                                uint32_t ccx = 2 * cx + ox, ccy = 2 * cy + oy,
                                         ccz = 2 * cz + oz;
                                MinMax c = pc[(size_t)ccx * cdim + ccz];
                                if ((uint64_t)(ccy + 1) * s2 <= c.mn) {
                                    ch[ci] = solid[level - 1];
                                } else if ((uint64_t)ccy * s2 >= c.mx) {
                                    ch[ci] = EMPTY;
                                } else {
                                    size_t ccol = (size_t)ccx * cdim + ccz;
                                    ch[ci] = prev_ids[
                                        prev_off[ccol] + (ccy - prev_lo[ccol])];
                                }
                            }
                    ids.push_back(s->create(CHILDREN, ch));
                }
            }
        offs[(size_t)dim * dim] = ids.size();
        prev_ids = std::move(ids);
        prev_lo = std::move(los);
        prev_off = std::move(offs);
    }

    MinMax top = pyr[log2_size][0];
    uint32_t new_root;
    if (top.mn >= size) new_root = solid[log2_size];
    else if (top.mx == 0) new_root = EMPTY;
    else new_root = prev_ids.empty() ? EMPTY : prev_ids[0];
    s->set_root(new_root);
    return new_root;
}

// Point query: returns 1 and fills rgb if solid, else 0.
int vx_get(void* h, uint32_t x, uint32_t y, uint32_t z, float* rgb) {
    Space* s = (Space*)h;
    if (s->root == EMPTY) return 0;
    uint32_t node = s->root;
    for (int level = (int)s->height() - 1; level >= 0; level--) {
        uint32_t c = 1u << level;
        uint32_t idx = ((x >= c) ? 1 : 0) | ((y >= c) ? 2 : 0) | ((z >= c) ? 4 : 0);
        node = s->nodes[node].payload[idx];
        if (node == EMPTY) return 0;
        if (x >= c) x -= c;
        if (y >= c) y -= c;
        if (z >= c) z -= c;
    }
    std::memcpy(rgb, s->nodes[node].payload, 12);
    return 1;
}

// Point query: slot id of the block leaf at (x,y,z), or -1 if air.
// Slots equal node ids in vx_serialize's table layout, so this is the
// device leaf slot (used by world/boxes.SoupPatcher for edited boxes).
long long vx_leaf_at(void* h, uint32_t x, uint32_t y, uint32_t z) {
    Space* s = (Space*)h;
    if (s->root == EMPTY) return -1;
    uint32_t node = s->root;
    for (int level = (int)s->height() - 1; level >= 0; level--) {
        uint32_t c = 1u << level;
        uint32_t idx = ((x >= c) ? 1 : 0) | ((y >= c) ? 2 : 0) | ((z >= c) ? 4 : 0);
        node = s->nodes[node].payload[idx];
        if (node == EMPTY) return -1;
        if (x >= c) x -= c;
        if (y >= c) y -= c;
        if (z >= c) z -= c;
    }
    return (long long)node;
}

// Point edit: has_color=0 clears the voxel (svo.rs:102-144 semantics).
void vx_set(void* h, uint32_t x, uint32_t y, uint32_t z, int has_color,
            float r, float g, float b) {
    Space* s = (Space*)h;
    int hgt = (int)s->height();
    uint32_t path_node[64];
    uint32_t path_idx[64];
    uint32_t node = s->root;
    for (int level = hgt - 1; level >= 0; level--) {
        uint32_t c = 1u << level;
        uint32_t idx = ((x >= c) ? 1 : 0) | ((y >= c) ? 2 : 0) | ((z >= c) ? 4 : 0);
        int d = hgt - 1 - level;
        path_node[d] = node;
        path_idx[d] = idx;
        node = node == EMPTY ? EMPTY : s->nodes[node].payload[idx];
        if (x >= c) x -= c;
        if (y >= c) y -= c;
        if (z >= c) z -= c;
    }

    uint32_t rgb[3];
    float col[3] = {r, g, b};
    std::memcpy(rgb, col, 12);
    if (node != EMPTY) {
        if (has_color && std::memcmp(s->nodes[node].payload, rgb, 12) == 0)
            return;
    } else if (!has_color) {
        return;
    }

    uint32_t new_node = has_color ? s->create(BLOCK, rgb) : EMPTY;
    for (int d = hgt - 1; d >= 0; d--) {
        uint32_t ch[8];
        if (path_node[d] != EMPTY)
            std::memcpy(ch, s->nodes[path_node[d]].payload, 32);
        else
            for (int i = 0; i < 8; i++) ch[i] = EMPTY;
        ch[path_idx[d]] = new_node;
        new_node = s->create(CHILDREN, ch);
    }
    s->set_root(new_node);
}

// Fill out (capacity i32) with the uniform solid-leaf id per node: for a
// node whose subtree is entirely solid with one color, the id of that
// leaf block; else -1. (Maintained at node creation; used by the beam
// traversal and the box-soup extractor.)
void vx_solid_leaf(void* h, int32_t* out) {
    Space* s = (Space*)h;
    std::memcpy(out, s->solidv.data(), s->solidv.size() * 4);
}

// Serialize into out_table (capacity * 8 u32, caller-allocated). Dead
// slots become all-EMPTY rows (fragment.rs:274-290 layout). Returns root.
uint32_t vx_serialize(void* h, uint32_t* out_table) {
    Space* s = (Space*)h;
    size_t cap = s->nodes.size();
    for (size_t i = 0; i < cap; i++) {
        const Node& n = s->nodes[i];
        uint32_t* row = out_table + i * 8;
        if (n.kind == BLOCK) {
            row[0] = n.payload[0];
            row[1] = n.payload[1];
            row[2] = n.payload[2];
            for (int c = 3; c < 8; c++) row[c] = EMPTY;
        } else if (n.kind == CHILDREN) {
            std::memcpy(row, n.payload, 32);
        } else {
            for (int c = 0; c < 8; c++) row[c] = EMPTY;
        }
    }
    s->dirty.clear();
    s->synced = true;
    return s->root;
}

// --- incremental device updates (voxtracer/world/svo.py serialize_delta) ---
//
// After a baseline vx_serialize, edits track dirty slots; the delta is the
// sorted unique dirty set with each slot's current row + solid value
// (freed slots appear as all-EMPTY rows). Protocol: vx_synced -> 1, then
// vx_delta_size (dedupes in place), then vx_delta_drain with buffers of
// that size (clears the set).

int vx_synced(void* h) { return ((Space*)h)->synced ? 1 : 0; }

uint32_t vx_delta_size(void* h) {
    Space* s = (Space*)h;
    std::sort(s->dirty.begin(), s->dirty.end());
    s->dirty.erase(std::unique(s->dirty.begin(), s->dirty.end()),
                   s->dirty.end());
    return (uint32_t)s->dirty.size();
}

void vx_delta_drain(void* h, uint32_t* rows, uint32_t* vals, int32_t* solid) {
    Space* s = (Space*)h;
    for (size_t k = 0; k < s->dirty.size(); k++) {
        uint32_t id = s->dirty[k];
        rows[k] = id;
        uint32_t* row = vals + k * 8;
        const Node& n = s->nodes[id];
        if (n.kind == BLOCK) {
            row[0] = n.payload[0];
            row[1] = n.payload[1];
            row[2] = n.payload[2];
            for (int c = 3; c < 8; c++) row[c] = EMPTY;
        } else if (n.kind == CHILDREN) {
            std::memcpy(row, n.payload, 32);
        } else {
            for (int c = 0; c < 8; c++) row[c] = EMPTY;
        }
        solid[k] = s->solidv[id];
    }
    s->dirty.clear();
}

} // extern "C"

// --- box-soup extraction (voxtracer/world/boxes.py, native edition) -------
//
// Flattens the octree into world-space box instances for the rasterizer:
// BFS emit of uniform-solid subtrees (solidv >= 0), big cubes split to
// max_size, enclosed boxes culled against a bit-packed occupancy grid,
// unit voxels merged into same-leaf x-strips capped at max_strip (same
// pipeline and box decomposition as the Python extractor; cross-checked
// in tests/test_boxes_native.py).

namespace {

struct BoxOut {
    std::vector<int32_t> lo;    // 3 per box
    std::vector<int32_t> size;  // 3 per box
    std::vector<int32_t> leaf;
};

struct BitGrid {
    // occupancy bit per voxel, packed along x into u64 words
    std::vector<uint64_t> bits;
    uint32_t n, wpr; // edge, words per x-row
    BitGrid(uint32_t n_) : n(n_), wpr((n_ + 63) / 64) {
        bits.assign((size_t)n * n * wpr, 0);
    }
    uint64_t* row(uint32_t y, uint32_t z) {
        return bits.data() + ((size_t)y * n + z) * wpr;
    }
    void fill_run(uint32_t y, uint32_t z, uint32_t x0, uint32_t x1) {
        uint64_t* r = row(y, z); // [x0, x1)
        uint32_t w0 = x0 >> 6, w1 = (x1 - 1) >> 6;
        uint64_t m0 = ~0ULL << (x0 & 63);
        uint64_t m1 = ~0ULL >> (63 - ((x1 - 1) & 63));
        if (w0 == w1) { r[w0] |= m0 & m1; return; }
        r[w0] |= m0;
        for (uint32_t w = w0 + 1; w < w1; w++) r[w] = ~0ULL;
        r[w1] |= m1;
    }
    bool run_full(uint32_t y, uint32_t z, uint32_t x0, uint32_t x1) {
        const uint64_t* r = row(y, z);
        uint32_t w0 = x0 >> 6, w1 = (x1 - 1) >> 6;
        uint64_t m0 = ~0ULL << (x0 & 63);
        uint64_t m1 = ~0ULL >> (63 - ((x1 - 1) & 63));
        if (w0 == w1) return (r[w0] & (m0 & m1)) == (m0 & m1);
        if ((r[w0] & m0) != m0 || (r[w1] & m1) != m1) return false;
        for (uint32_t w = w0 + 1; w < w1; w++)
            if (r[w] != ~0ULL) return false;
        return true;
    }
    bool get(uint32_t y, uint32_t z, uint32_t x) {
        return (row(y, z)[x >> 6] >> (x & 63)) & 1;
    }
};

} // namespace

extern "C" {

// Extract the box soup. Output arrays are owned by the returned handle
// (read them out, then vx_boxes_free). cull_enclosed requires
// height <= max_cull_log2 memory-wise (bitgrid = 2^(3h-3) bytes); callers
// pass 0 to skip. Returns nullptr only on a null space.
void* vx_extract_boxes(void* h, int cull_enclosed, int max_size,
                       int max_strip) {
    Space* s = (Space*)h;
    if (!s) return nullptr;
    auto* out = new BoxOut();
    if (s->root == EMPTY) return out;
    uint32_t H = s->height();
    uint32_t n = 1u << H;

    // BFS emit: (node, level, pos) with uniform-solid subtrees emitted
    struct Item { uint32_t node, level; uint32_t p[3]; };
    std::vector<Item> stack{{s->root, H, {0, 0, 0}}};
    std::vector<int32_t> elo, esz, elf; // emitted cubes (pre-split)
    while (!stack.empty()) {
        Item it = stack.back();
        stack.pop_back();
        int32_t sl = s->solidv[it.node];
        if (sl >= 0) {
            elo.insert(elo.end(), {(int32_t)it.p[0], (int32_t)it.p[1],
                                   (int32_t)it.p[2]});
            esz.push_back(1 << it.level);
            elf.push_back(sl);
            continue;
        }
        const Node& nd = s->nodes[it.node];
        uint32_t half = 1u << (it.level - 1);
        for (int c = 0; c < 8; c++) {
            if (nd.payload[c] == EMPTY) continue;
            stack.push_back({nd.payload[c], it.level - 1,
                             {it.p[0] + (c & 1 ? half : 0),
                              it.p[1] + (c & 2 ? half : 0),
                              it.p[2] + (c & 4 ? half : 0)}});
        }
    }

    // split cubes larger than max_size
    std::vector<int32_t> lo, sz, lf;
    for (size_t i = 0; i < esz.size(); i++) {
        int32_t cs = esz[i];
        if (cs <= max_size) {
            lo.insert(lo.end(), {elo[3 * i], elo[3 * i + 1], elo[3 * i + 2]});
            sz.push_back(cs);
            lf.push_back(elf[i]);
            continue;
        }
        for (int32_t dx = 0; dx < cs; dx += max_size)
            for (int32_t dy = 0; dy < cs; dy += max_size)
                for (int32_t dz = 0; dz < cs; dz += max_size) {
                    lo.insert(lo.end(), {elo[3 * i] + dx, elo[3 * i + 1] + dy,
                                         elo[3 * i + 2] + dz});
                    sz.push_back(max_size);
                    lf.push_back(elf[i]);
                }
    }

    // enclosure cull against bit-packed occupancy
    std::vector<char> keep(sz.size(), 1);
    if (cull_enclosed && !sz.empty()) {
        BitGrid g(n);
        for (size_t i = 0; i < sz.size(); i++) {
            uint32_t x0 = lo[3 * i], y0 = lo[3 * i + 1], z0 = lo[3 * i + 2];
            uint32_t cs = sz[i];
            for (uint32_t y = y0; y < y0 + cs; y++)
                for (uint32_t z = z0; z < z0 + cs; z++)
                    g.fill_run(y, z, x0, x0 + cs);
        }
        for (size_t i = 0; i < sz.size(); i++) {
            uint32_t x0 = lo[3 * i], y0 = lo[3 * i + 1], z0 = lo[3 * i + 2];
            uint32_t cs = sz[i];
            bool enc = x0 >= 1 && y0 >= 1 && z0 >= 1 && x0 + cs < n
                       && y0 + cs < n && z0 + cs < n;
            // -x/+x: bit columns at x0-1 / x0+cs over the (y,z) face
            for (uint32_t y = y0; enc && y < y0 + cs; y++)
                for (uint32_t z = z0; enc && z < z0 + cs; z++)
                    enc = g.get(y, z, x0 - 1) && g.get(y, z, x0 + cs);
            // -y/+y: x-runs at y0-1 / y0+cs over z range
            for (uint32_t z = z0; enc && z < z0 + cs; z++)
                enc = g.run_full(y0 - 1, z, x0, x0 + cs)
                      && g.run_full(y0 + cs, z, x0, x0 + cs);
            // -z/+z
            for (uint32_t y = y0; enc && y < y0 + cs; y++)
                enc = g.run_full(y, z0 - 1, x0, x0 + cs)
                      && g.run_full(y, z0 + cs, x0, x0 + cs);
            keep[i] = !enc;
        }
    }

    // non-unit boxes pass through; unit voxels merge into x-strips
    struct Unit { uint64_t key; int32_t leaf; };
    std::vector<Unit> units;
    for (size_t i = 0; i < sz.size(); i++) {
        if (!keep[i]) continue;
        if (sz[i] == 1) {
            uint64_t key = (((uint64_t)(uint32_t)lo[3 * i + 1] * n
                             + (uint32_t)lo[3 * i + 2]) << 20)
                           | (uint32_t)lo[3 * i]; // (y,z) major, x minor
            units.push_back({key, lf[i]});
        } else {
            out->lo.insert(out->lo.end(),
                           {lo[3 * i], lo[3 * i + 1], lo[3 * i + 2]});
            out->size.insert(out->size.end(), {sz[i], sz[i], sz[i]});
            out->leaf.push_back(lf[i]);
        }
    }
    std::sort(units.begin(), units.end(),
              [](const Unit& a, const Unit& b) { return a.key < b.key; });
    size_t i = 0;
    while (i < units.size()) {
        uint64_t row = units[i].key >> 20;
        uint32_t x0 = units[i].key & 0xFFFFF;
        int32_t leaf = units[i].leaf;
        uint32_t len = 1;
        while (i + len < units.size()
               && units[i + len].key == units[i].key + len
               && (units[i + len].key >> 20) == row
               && units[i + len].leaf == leaf
               && (int32_t)((x0 + len) % max_strip) != 0)
            len++;
        uint32_t y = (uint32_t)(row / n), z = (uint32_t)(row % n);
        out->lo.insert(out->lo.end(), {(int32_t)x0, (int32_t)y, (int32_t)z});
        out->size.insert(out->size.end(), {(int32_t)len, 1, 1});
        out->leaf.push_back(leaf);
        i += len;
    }
    return out;
}

uint32_t vx_boxes_count(void* r) {
    return (uint32_t)((BoxOut*)r)->leaf.size();
}

void vx_boxes_fill(void* r, int32_t* lo, int32_t* size, int32_t* leaf) {
    BoxOut* b = (BoxOut*)r;
    std::memcpy(lo, b->lo.data(), b->lo.size() * 4);
    std::memcpy(size, b->size.data(), b->size.size() * 4);
    std::memcpy(leaf, b->leaf.data(), b->leaf.size() * 4);
}

void vx_boxes_free(void* r) { delete (BoxOut*)r; }

} // extern "C"
