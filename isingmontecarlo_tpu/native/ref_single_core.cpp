// Single-chain, single-core SSE TFIM benchmark — a faithful C++
// re-implementation of the reference Rust crate's benchmark path, used to
// measure the "Rust single-core" denominator of BASELINE.md's ESS/sec north
// star on this machine (the image has no cargo/rustc, so the reference's
// own `cargo bench` cannot run).
//
// Algorithms mirrored (semantics, not code):
//   - operator storage: doubly-linked global + per-variable worldline lists
//     over a padded slot vector (fast_ops.rs:35-49, 176-207), O(1)
//     insert/remove during sweeps (fast_ops.rs:305-609).
//   - diagonal Metropolis update: Sandvik eqs 19a/19b acceptance, uniform
//     bond proposals (diagonal.rs:141-191).
//   - cluster update: BFS over op legs bounded by constant single-var
//     (transverse-field) ops, each cluster flipped with p=1/2
//     (cluster.rs:36-271); p=0 state updates at worldline heads.
//   - free-spin resampling and cutoff growth M = max(M, n + n/2)
//     (qmc_ising.rs:780-786).
//   - TFIM matrix elements/bond layout: two-site |J|-J/|J|+J, transverse
//     bonds constant Γ (qmc_ising.rs:186-205, 863-882).
//   - benchmark lattice: L x L periodic, right couplings -1, down couplings
//     +/-1 by column parity (benches/end_to_end.rs:12-30), beta=1, Γ=1,
//     1000 warmup timesteps (benches/end_to_end.rs:96-166).
//   - RNG: xoshiro256++ — the same generator family as the reference's
//     SmallRng on 64-bit targets.
//
// Build/run: scripts/ref_cpu_bench.sh (g++ -O3). Output: one line per
// timestep "n=<opcount>" on --dump-n, then a summary line with
// ns/timestep. ESS is computed by the calling script with the same
// integrated-autocorrelation methodology as bench.py.
//
// Usage: ref_single_core L beta warmup steps [seed] [--check] [--dump-n]
//        [--edges FILE]   (FILE: "nvars ne" then ne lines "a b J"; replaces
//                          the benchmark lattice — for differential testing
//                          against the JAX engine on arbitrary graphs)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

namespace {

// ---------------------------------------------------------------- RNG ----
struct SplitMix64 {
    uint64_t s;
    explicit SplitMix64(uint64_t seed) : s(seed) {}
    uint64_t next() {
        uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
        z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
        z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
        return z ^ (z >> 31);
    }
};

struct Xoshiro256pp {  // SmallRng's generator on 64-bit platforms
    uint64_t s[4];
    explicit Xoshiro256pp(uint64_t seed) {
        SplitMix64 sm(seed);
        for (auto& w : s) w = sm.next();
    }
    static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
    uint64_t next() {
        uint64_t r = rotl(s[0] + s[3], 23) + s[0];
        uint64_t t = s[1] << 17;
        s[2] ^= s[0];
        s[3] ^= s[1];
        s[1] ^= s[2];
        s[0] ^= s[3];
        s[2] ^= t;
        s[3] = rotl(s[3], 45);
        return r;
    }
    double uniform() { return (next() >> 11) * 0x1.0p-53; }
    bool gen_bool(double p) { return uniform() < p; }
    // Lemire bounded sampling (what rand's gen_range uses).
    uint32_t gen_range(uint32_t bound) {
        uint64_t m = uint64_t(uint32_t(next())) * bound;
        uint32_t lo = uint32_t(m);
        if (lo < bound) {
            uint32_t t = -bound % bound;
            while (lo < t) {
                m = uint64_t(uint32_t(next())) * bound;
                lo = uint32_t(m);
            }
        }
        return uint32_t(m >> 32);
    }
};

// ------------------------------------------------------------ op string ----
struct PRel {
    int32_t p = -1;
    int8_t rel = 0;
};

struct Node {
    int32_t bond = -1;  // -1 => empty slot
    int8_t nv = 0;
    bool constant = false;
    int32_t vars[2] = {-1, -1};
    bool ins[2] = {false, false};
    bool outs[2] = {false, false};
    int32_t next_p = -1, prev_p = -1;  // global occupied-slot list
    PRel nextv[2], prevv[2];           // per-rel-var worldline links

    bool diagonal() const {
        for (int r = 0; r < nv; ++r)
            if (ins[r] != outs[r]) return false;
        return true;
    }
};

struct VarEnds {
    PRel first, last;
};

struct Lattice {
    int nvars = 0;
    std::vector<int32_t> ea, eb;  // edge endpoints
    std::vector<double> ej;       // couplings
    int nedges() const { return int(ea.size()); }
    int nbonds() const { return nedges() + nvars; }  // + transverse bonds
};

// benches/end_to_end.rs:12-30: right couplings -1, down +/-1 by column.
Lattice two_d_periodic(int l) {
    Lattice lat;
    lat.nvars = l * l;
    auto f = [l](int i, int j) { return j * l + i; };
    for (int j = 0; j < l; ++j)
        for (int i = 0; i < l; ++i) {
            lat.ea.push_back(f(i, j));
            lat.eb.push_back(f((i + 1) % l, j));
            lat.ej.push_back(-1.0);
        }
    for (int j = 0; j < l; ++j)
        for (int i = 0; i < l; ++i) {
            lat.ea.push_back(f(i, j));
            lat.eb.push_back(f(i, (j + 1) % l));
            lat.ej.push_back(i % 2 == 0 ? 1.0 : -1.0);
        }
    return lat;
}

struct Sim {
    Lattice lat;
    double beta = 1.0, transverse = 1.0;
    int M = 0;  // cutoff
    int n = 0;  // op count
    std::vector<Node> ops;
    std::vector<VarEnds> var_ends;
    int32_t first_p = -1, last_p = -1;
    std::vector<uint8_t> state;  // p=0 spins
    Xoshiro256pp rng;

    // scratch for updates
    std::vector<uint8_t> prop;                 // propagated state
    std::vector<PRel> last_for_var;            // sweep cursors
    std::vector<int32_t> cl_in, cl_out;        // cluster ids per slot
    std::vector<std::pair<int32_t, int8_t>> frontier;
    std::vector<std::pair<int32_t, int16_t>> interior;  // (p, rel*2+side)
    std::vector<uint8_t> flips;

    Sim(Lattice l, double b, int cutoff, uint64_t seed)
        : lat(std::move(l)), beta(b), M(cutoff), rng(seed) {
        ops.resize(M);
        var_ends.assign(lat.nvars, VarEnds{});
        state.resize(lat.nvars);
        for (auto& s : state) s = rng.gen_bool(0.5);
        prop.resize(lat.nvars);
        last_for_var.resize(lat.nvars);
    }

    // qmc_ising.rs:863-882 matrix elements for diagonal (in==out) substates.
    double diag_weight(int bond, const uint8_t* st) const {
        if (bond < lat.nedges()) {
            double j = lat.ej[bond];
            bool a = st[lat.ea[bond]], b = st[lat.eb[bond]];
            double s = (a == b) ? -j : j;
            return (j < 0 ? -j : j) + s;
        }
        return transverse;  // constant single-var bond
    }

    void bond_vars(int bond, int32_t out[2], int& nv, bool& constant) const {
        if (bond < lat.nedges()) {
            out[0] = lat.ea[bond];
            out[1] = lat.eb[bond];
            nv = 2;
            constant = false;
        } else {
            out[0] = bond - lat.nedges();
            out[1] = -1;
            nv = 1;
            constant = true;
        }
    }

    // ---- linked-list surgery (fast_ops.rs:305-609 semantics) ------------
    void insert_at(int p, int bond, int prev_occ) {
        Node& nd = ops[p];
        nd.bond = bond;
        int nv = 0;
        bond_vars(bond, nd.vars, nv, nd.constant);
        nd.nv = int8_t(nv);
        for (int r = 0; r < nd.nv; ++r) {
            nd.ins[r] = nd.outs[r] = prop[nd.vars[r]] != 0;
        }
        // global list: after prev_occ
        int32_t nxt = prev_occ < 0 ? first_p : ops[prev_occ].next_p;
        nd.prev_p = prev_occ;
        nd.next_p = nxt;
        if (prev_occ < 0) first_p = p; else ops[prev_occ].next_p = p;
        if (nxt < 0) last_p = p; else ops[nxt].prev_p = p;
        // per-var lists: after last_for_var[v]
        for (int r = 0; r < nd.nv; ++r) {
            int v = nd.vars[r];
            PRel prev = last_for_var[v];
            PRel nxtv = prev.p < 0 ? var_ends[v].first
                                   : ops[prev.p].nextv[prev.rel];
            nd.prevv[r] = prev;
            nd.nextv[r] = nxtv;
            PRel me{int32_t(p), int8_t(r)};
            if (prev.p < 0) var_ends[v].first = me;
            else ops[prev.p].nextv[prev.rel] = me;
            if (nxtv.p < 0) var_ends[v].last = me;
            else ops[nxtv.p].prevv[nxtv.rel] = me;
            last_for_var[v] = me;
        }
        ++n;
    }

    void remove_at(int p) {
        Node& nd = ops[p];
        if (nd.prev_p < 0) first_p = nd.next_p; else ops[nd.prev_p].next_p = nd.next_p;
        if (nd.next_p < 0) last_p = nd.prev_p; else ops[nd.next_p].prev_p = nd.prev_p;
        for (int r = 0; r < nd.nv; ++r) {
            int v = nd.vars[r];
            PRel pv = nd.prevv[r], nx = nd.nextv[r];
            if (pv.p < 0) var_ends[v].first = nx; else ops[pv.p].nextv[pv.rel] = nx;
            if (nx.p < 0) var_ends[v].last = pv; else ops[nx.p].prevv[nx.rel] = pv;
        }
        nd = Node{};
        --n;
    }

    // ---- diagonal Metropolis sweep (diagonal.rs:141-191) -----------------
    void diagonal_update() {
        std::memcpy(prop.data(), state.data(), state.size());
        for (auto& c : last_for_var) c = PRel{};
        int prev_occ = -1;
        const double bnb = beta * double(lat.nbonds());
        for (int p = 0; p < M; ++p) {
            Node& nd = ops[p];
            if (nd.bond < 0) {
                int b = int(rng.gen_range(uint32_t(lat.nbonds())));
                double w = diag_weight(b, prop.data());
                double num = bnb * w, den = double(M - n);
                if (num > den || rng.gen_bool(num / den)) {
                    insert_at(p, b, prev_occ);
                    prev_occ = p;
                    // cursors already advanced by insert_at
                }
            } else if (nd.diagonal()) {
                double w = diag_weight(nd.bond, prop.data());
                double num = bnb * w, den = double(M - n) + 1.0;
                if (den > num || rng.gen_bool(den / num)) {
                    remove_at(p);
                } else {
                    for (int r = 0; r < nd.nv; ++r)
                        last_for_var[nd.vars[r]] = PRel{int32_t(p), int8_t(r)};
                    prev_occ = p;
                }
            } else {  // off-diagonal: propagate
                for (int r = 0; r < nd.nv; ++r) {
                    prop[nd.vars[r]] = nd.outs[r];
                    last_for_var[nd.vars[r]] = PRel{int32_t(p), int8_t(r)};
                }
                prev_occ = p;
            }
        }
    }

    // ---- cluster update (cluster.rs:36-271) -------------------------------
    static bool cluster_edge(const Node& nd) { return nd.constant && nd.nv == 1; }

    bool set_boundary(int p, int side, int c) {
        int32_t& slot = side == 0 ? cl_in[p] : cl_out[p];
        if (slot < 0) slot = c;
        return cl_in[p] >= 0 && cl_out[p] >= 0;
    }

    void expand_cluster(int p0, int side0, int c) {
        interior.clear();
        const Node& nd0 = ops[p0];
        if (!cluster_edge(nd0)) {
            for (int r = 0; r < nd0.nv; ++r) {
                interior.push_back({p0, int16_t(r * 2 + 0)});
                interior.push_back({p0, int16_t(r * 2 + 1)});
            }
        } else {
            interior.push_back({p0, int16_t(0 * 2 + side0)});
        }
        while (!interior.empty()) {
            auto [p, rs] = interior.back();
            interior.pop_back();
            int rel = rs >> 1, side = rs & 1;
            set_boundary(p, side, c);
            const Node& nd = ops[p];
            int v = nd.vars[rel];
            PRel adj;
            int next_side;
            if (side == 0) {  // Inputs -> previous op (wrap to var last)
                adj = nd.prevv[rel];
                if (adj.p < 0) adj = var_ends[v].last;
                next_side = 1;  // arrive at its Outputs
            } else {  // Outputs -> next op (wrap to var first)
                adj = nd.nextv[rel];
                if (adj.p < 0) adj = var_ends[v].first;
                next_side = 0;  // arrive at its Inputs
            }
            Node& an = ops[adj.p];
            if (cluster_edge(an)) {
                if (!set_boundary(adj.p, next_side, c))
                    frontier.push_back({adj.p, int8_t(1 - next_side)});
            } else {
                int32_t a = cl_in[adj.p], b = cl_out[adj.p];
                bool takeable = (a < 0 && b < 0) || (a == c && b < 0) ||
                                (a < 0 && b == c);
                if (takeable) {
                    set_boundary(adj.p, 0, c);
                    set_boundary(adj.p, 1, c);
                    for (int r = 0; r < an.nv; ++r)
                        for (int s = 0; s < 2; ++s)
                            if (!(r == adj.rel && s == next_side))
                                interior.push_back({adj.p, int16_t(r * 2 + s)});
                }
            }
        }
    }

    void cluster_update() {
        if (n == 0) return;
        cl_in.assign(M, -1);
        cl_out.assign(M, -1);
        // find first constant op (cluster.rs:173-187)
        int const_p = -1;
        for (int p = first_p; p >= 0; p = ops[p].next_p)
            if (cluster_edge(ops[p])) { const_p = p; break; }
        int nclusters = 0;
        if (const_p >= 0) {
            frontier.clear();
            frontier.push_back({const_p, 1});
            frontier.push_back({const_p, 0});
            int scan_from = first_p;
            for (;;) {
                while (!frontier.empty()) {
                    auto [p, fside] = frontier.back();
                    frontier.pop_back();
                    bool in_set = cl_in[p] >= 0, out_set = cl_out[p] >= 0;
                    if (in_set && out_set) continue;  // hit by another cluster
                    expand_cluster(p, fside, nclusters++);
                }
                // any occupied op not yet mapped seeds a fresh component
                int unmapped = -1;
                for (int p = scan_from; p >= 0; p = ops[p].next_p)
                    if (cl_in[p] < 0) { unmapped = p; break; }
                if (unmapped < 0) break;
                scan_from = unmapped;
                frontier.push_back({unmapped, 1});
                frontier.push_back({unmapped, 0});
            }
        } else {
            for (int p = first_p; p >= 0; p = ops[p].next_p)
                cl_in[p] = cl_out[p] = 0;
            nclusters = 1;
        }
        flips.resize(nclusters);
        for (auto& f : flips) f = rng.gen_bool(0.5);
        for (int p = first_p; p >= 0; p = ops[p].next_p) {
            Node& nd = ops[p];
            if (flips[cl_in[p]]) {
                for (int r = 0; r < nd.nv; ++r) {
                    nd.ins[r] = !nd.ins[r];
                    if (nd.prevv[r].p < 0) state[nd.vars[r]] = nd.ins[r];
                }
            }
            if (flips[cl_out[p]])
                for (int r = 0; r < nd.nv; ++r) nd.outs[r] = !nd.outs[r];
        }
    }

    // ---- free spins + growth (qmc_ising.rs:780-786) -----------------------
    void flip_free_and_grow() {
        for (int v = 0; v < lat.nvars; ++v)
            if (var_ends[v].first.p < 0) state[v] = rng.gen_bool(0.5);
        int want = n + n / 2;
        if (want > M) {
            ops.resize(want);
            M = want;
        }
    }

    void timestep() {
        diagonal_update();
        cluster_update();
        flip_free_and_grow();
    }

    // ---- worldline-integrity oracle (op_container.rs:137-159) ------------
    bool verify() const {
        std::vector<uint8_t> cur(state.begin(), state.end());
        for (int p = first_p; p >= 0; p = ops[p].next_p) {
            const Node& nd = ops[p];
            for (int r = 0; r < nd.nv; ++r) {
                if ((cur[nd.vars[r]] != 0) != nd.ins[r]) return false;
                cur[nd.vars[r]] = nd.outs[r];
            }
            // all kept ops must have positive weight (qmc_ising.rs:829-861)
            if (nd.diagonal() && nd.bond < lat.nedges()) {
                uint8_t st[2] = {uint8_t(nd.ins[0]), uint8_t(nd.ins[1])};
                double j = lat.ej[nd.bond];
                double w = (j < 0 ? -j : j) + ((st[0] == st[1]) ? -j : j);
                if (w <= 0) return false;
            }
        }
        for (int v = 0; v < lat.nvars; ++v)
            if (cur[v] != state[v]) return false;
        return true;
    }
};

}  // namespace

int main(int argc, char** argv) {
    if (argc < 5) {
        std::fprintf(stderr,
                     "usage: %s L beta warmup steps [seed] [--check] [--dump-n]\n",
                     argv[0]);
        return 2;
    }
    int L = std::atoi(argv[1]);
    double beta = std::atof(argv[2]);
    int warmup = std::atoi(argv[3]);
    int steps = std::atoi(argv[4]);
    uint64_t seed = argc > 5 ? std::strtoull(argv[5], nullptr, 10) : 1234;
    bool check = false, dump_n = false;
    const char* edges_file = nullptr;
    for (int i = 5; i < argc; ++i) {
        if (!std::strcmp(argv[i], "--check")) check = true;
        if (!std::strcmp(argv[i], "--dump-n")) dump_n = true;
        if (!std::strcmp(argv[i], "--edges") && i + 1 < argc)
            edges_file = argv[++i];
    }

    Lattice lat;
    if (edges_file) {
        std::FILE* f = std::fopen(edges_file, "r");
        if (!f) {
            std::fprintf(stderr, "cannot open %s\n", edges_file);
            return 2;
        }
        int ne = 0;
        if (std::fscanf(f, "%d %d", &lat.nvars, &ne) != 2) return 2;
        for (int i = 0; i < ne; ++i) {
            int a, b;
            double j;
            if (std::fscanf(f, "%d %d %lf", &a, &b, &j) != 3) return 2;
            lat.ea.push_back(a);
            lat.eb.push_back(b);
            lat.ej.push_back(j);
        }
        std::fclose(f);
    } else {
        lat = two_d_periodic(L);
    }
    Sim sim(std::move(lat), beta, L, seed);  // initial cutoff = L, as bench
    for (int t = 0; t < warmup; ++t) {
        sim.timestep();
        if (check && !sim.verify()) {
            std::fprintf(stderr, "verify FAILED at warmup step %d\n", t);
            return 1;
        }
    }
    std::vector<int> ns;
    ns.reserve(steps);
    auto t0 = std::chrono::steady_clock::now();
    for (int t = 0; t < steps; ++t) {
        sim.timestep();
        ns.push_back(sim.n);
        if (check && !sim.verify()) {
            std::fprintf(stderr, "verify FAILED at step %d\n", t);
            return 1;
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double sec =
        std::chrono::duration_cast<std::chrono::duration<double>>(t1 - t0)
            .count();
    if (dump_n)
        for (int v : ns) std::printf("n=%d\n", v);
    double mean_n = 0;
    for (int v : ns) mean_n += v;
    mean_n /= ns.size();
    // E = -<n>/beta + offset, offset = sum|J| + nvars*transverse
    double offset = 0;
    for (double j : sim.lat.ej) offset += j < 0 ? -j : j;
    offset += sim.lat.nvars * sim.transverse;
    std::printf(
        "summary L=%d beta=%g steps=%d ns_per_timestep=%.1f mean_n=%.1f "
        "energy_per_site=%.6f cutoff=%d verify=%d\n",
        L, beta, steps, sec / steps * 1e9, mean_n,
        (-mean_n / beta + offset) / sim.lat.nvars, sim.M, int(sim.verify()));
    return 0;
}
