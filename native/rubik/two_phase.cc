// Two-phase (Kociemba) Rubik's-cube solver — native C++ goal service.
//
// Replaces the reference's `kociemba` C extension (reference
// /root/reference/robogym/utils/rubik_utils.py:1-31 wraps kociemba.solve for
// the solver-driven goal generators, envs/dactyl/goals/face_cube_solver.py
// and rubik_cube_solver.py). Episodic host-side work: solutions are computed
// between goals and fed to the device as data, exactly like the reference's
// native solver.
//
// Standard two-phase structure:
//   cubie-level model (corner/edge permutation + orientation)
//   phase 1 coords: twist (3^7), flip (2^11), udslice (C(12,4))
//   phase 2 coords: corner perm (8!), UD-edge perm (8!), slice perm (4!)
//   BFS pruning tables per (coord, axis) pair; IDA* over both phases.
//
// Build: g++ -O2 -shared -fPIC -o librubik.so two_phase.cc
// API:   int rubik_solve(const char* facelets54, int max_depth,
//                        char* out, int out_len);

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>
#include <array>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// cubie model
// ---------------------------------------------------------------------------
// corners: URF, UFL, ULB, UBR, DFR, DLF, DBL, DRB
// edges:   UR, UF, UL, UB, DR, DF, DL, DB, FR, FL, BL, BR
struct Cube {
  std::array<int8_t, 8> cp, co;
  std::array<int8_t, 12> ep, eo;
  Cube() {
    for (int i = 0; i < 8; i++) { cp[i] = i; co[i] = 0; }
    for (int i = 0; i < 12; i++) { ep[i] = i; eo[i] = 0; }
  }
};

// basic moves as cubie permutations (Kociemba's tables)
const int8_t cpU[8] = {3,0,1,2,4,5,6,7}, coU[8] = {0,0,0,0,0,0,0,0};
const int8_t epU[12] = {3,0,1,2,4,5,6,7,8,9,10,11}, eoU[12] = {0};
const int8_t cpR[8] = {4,1,2,0,7,5,6,3}, coR[8] = {2,0,0,1,1,0,0,2};
const int8_t epR[12] = {8,1,2,3,11,5,6,7,4,9,10,0}, eoR[12] = {0};
const int8_t cpF[8] = {1,5,2,3,0,4,6,7}, coF[8] = {1,2,0,0,2,1,0,0};
const int8_t epF[12] = {0,9,2,3,4,8,6,7,1,5,10,11},
             eoF[12] = {0,1,0,0,0,1,0,0,1,1,0,0};
const int8_t cpD[8] = {0,1,2,3,5,6,7,4}, coD[8] = {0};
const int8_t epD[12] = {0,1,2,3,5,6,7,4,8,9,10,11}, eoD[12] = {0};
const int8_t cpL[8] = {0,2,6,3,4,1,5,7}, coL[8] = {0,1,2,0,0,2,1,0};
const int8_t epL[12] = {0,1,10,3,4,5,9,7,8,2,6,11}, eoL[12] = {0};
const int8_t cpB[8] = {0,1,3,7,4,5,2,6}, coB[8] = {0,0,1,2,0,0,2,1};
const int8_t epB[12] = {0,1,2,11,4,5,6,10,8,9,3,7},
             eoB[12] = {0,0,0,1,0,0,0,1,0,0,1,1};

Cube basic_move(int face) {
  Cube c;
  const int8_t *cp, *co, *ep, *eo;
  switch (face) {
    case 0: cp = cpU; co = coU; ep = epU; eo = eoU; break;
    case 1: cp = cpR; co = coR; ep = epR; eo = eoR; break;
    case 2: cp = cpF; co = coF; ep = epF; eo = eoF; break;
    case 3: cp = cpD; co = coD; ep = epD; eo = eoD; break;
    case 4: cp = cpL; co = coL; ep = epL; eo = eoL; break;
    default: cp = cpB; co = coB; ep = epB; eo = eoB; break;
  }
  for (int i = 0; i < 8; i++) { c.cp[i] = cp[i]; c.co[i] = co[i]; }
  for (int i = 0; i < 12; i++) { c.ep[i] = ep[i]; c.eo[i] = eo[i]; }
  return c;
}

Cube multiply(const Cube& a, const Cube& b) {
  // result = a * b (apply b to a)
  Cube c;
  for (int i = 0; i < 8; i++) {
    c.cp[i] = a.cp[b.cp[i]];
    c.co[i] = (int8_t)((a.co[b.cp[i]] + b.co[i]) % 3);
  }
  for (int i = 0; i < 12; i++) {
    c.ep[i] = a.ep[b.ep[i]];
    c.eo[i] = (int8_t)((a.eo[b.ep[i]] + b.eo[i]) & 1);
  }
  return c;
}

// 18 moves: face*3 + (turns-1), faces URFDLB
Cube MOVE_CUBE[18];

void init_moves() {
  for (int f = 0; f < 6; f++) {
    Cube m = basic_move(f);
    Cube acc = m;
    for (int t = 0; t < 3; t++) {
      MOVE_CUBE[f * 3 + t] = acc;
      acc = multiply(acc, m);
    }
  }
}

// ---------------------------------------------------------------------------
// coordinates
// ---------------------------------------------------------------------------
int twist_of(const Cube& c) {
  int t = 0;
  for (int i = 0; i < 7; i++) t = t * 3 + c.co[i];
  return t;
}
void set_twist(Cube& c, int t) {
  int sum = 0;
  for (int i = 6; i >= 0; i--) { c.co[i] = (int8_t)(t % 3); sum += c.co[i]; t /= 3; }
  c.co[7] = (int8_t)((3 - sum % 3) % 3);
}
int flip_of(const Cube& c) {
  int f = 0;
  for (int i = 0; i < 11; i++) f = f * 2 + c.eo[i];
  return f;
}
void set_flip(Cube& c, int f) {
  int sum = 0;
  for (int i = 10; i >= 0; i--) { c.eo[i] = (int8_t)(f & 1); sum += c.eo[i]; f >>= 1; }
  c.eo[11] = (int8_t)((2 - sum % 2) % 2);
}
int Cnk(int n, int k) {
  if (k > n) return 0;
  if (k > n - k) k = n - k;
  int s = 1;
  for (int i = 0, j = n; i < k; i++, j--) { s = s * j / (i + 1); }
  return s;
}
// udslice: positions of edges 8..11 (FR, FL, BL, BR)
int udslice_of(const Cube& c) {
  int s = 0, k = -1;
  for (int i = 0; i < 12; i++) {
    if (c.ep[i] >= 8) k++;
    else if (k >= 0) s += Cnk(i, k);
  }
  return s;
}
void set_udslice(Cube& c, int s) {
  // inverse of udslice_of: walk positions from high to low, placing the 4
  // slice edges where the combinatorial count says so
  std::array<int8_t, 12> ep;
  std::array<bool, 12> is_slice{};
  int x = s, k = 3;
  for (int i = 11; i >= 0 && k >= 0; i--) {
    if (x >= Cnk(i, k)) {
      x -= Cnk(i, k);
    } else {
      is_slice[i] = true;
      k--;
    }
  }
  int slice_idx = 8, other_idx = 0;
  for (int i = 0; i < 12; i++) {
    if (is_slice[i]) ep[i] = (int8_t)slice_idx++;
    else ep[i] = (int8_t)other_idx++;
  }
  c.ep = ep;
}

// phase 2 coordinates (only valid for phase-2 states)
int perm8_coord(const int8_t* p) {
  int x = 0;
  for (int i = 7; i > 0; i--) {
    int s = 0;
    for (int j = 0; j < i; j++) if (p[j] > p[i]) s++;
    x = (x + s) * i;
  }
  return x;
}
void set_perm8(int8_t* p, int x) {
  // inverse of perm8_coord: the encode is Horner over factorial digits
  // s_i = #{j < i : p[j] > p[i]}, x = (((s_7)*7 + s_6)*6 + ...)*1, so the
  // digits come back in ASCENDING i order
  std::array<int, 8> s{};
  for (int i = 1; i < 8; i++) { s[i] = x % (i + 1); x /= (i + 1); }
  std::array<int8_t, 8> out{};
  std::vector<int> av{0, 1, 2, 3, 4, 5, 6, 7};
  for (int i = 7; i >= 0; i--) {
    // s[i] of the values at positions j < i are greater than p[i], and all
    // remaining values other than p[i] end up at positions j < i
    int idx = (int)av.size() - 1 - s[i];
    out[i] = (int8_t)av[idx];
    av.erase(av.begin() + idx);
  }
  for (int i = 0; i < 8; i++) p[i] = out[i];
}

int sliceperm_of(const Cube& c) {
  // permutation of the 4 slice edges in positions 8..11
  int8_t p[4];
  for (int i = 0; i < 4; i++) p[i] = (int8_t)(c.ep[8 + i] - 8);
  int x = 0;
  for (int i = 3; i > 0; i--) {
    int s = 0;
    for (int j = 0; j < i; j++) if (p[j] > p[i]) s++;
    x = (x + s) * i;
  }
  return x;
}
void set_sliceperm(Cube& c, int x) {
  // factorial digits come back in ASCENDING order (see set_perm8)
  std::array<int, 4> s{};
  for (int i = 1; i <= 3; i++) { s[i] = x % (i + 1); x /= (i + 1); }
  std::vector<int> av{0,1,2,3};
  std::array<int8_t, 4> out{};
  for (int i = 3; i >= 0; i--) {
    int idx = (int)av.size() - 1 - s[i];
    out[i] = (int8_t)av[idx];
    av.erase(av.begin() + idx);
  }
  for (int i = 0; i < 4; i++) c.ep[8 + i] = (int8_t)(out[i] + 8);
}

int cperm_of(const Cube& c) { return perm8_coord(c.cp.data()); }
int eperm_of(const Cube& c) { return perm8_coord(c.ep.data()); }

// ---------------------------------------------------------------------------
// move + pruning tables
// ---------------------------------------------------------------------------
constexpr int N_TWIST = 2187, N_FLIP = 2048, N_SLICE = 495;
constexpr int N_PERM8 = 40320, N_SLICEP = 24;
// phase 2 allowed moves: U,U2,U', D,D2,D', R2, F2, L2, B2
const int PHASE2_MOVES[10] = {0,1,2,9,10,11,4,7,13,16};

std::vector<uint16_t> twist_move, flip_move, slice_move;
std::vector<uint16_t> cperm_move, eperm_move;
std::vector<uint8_t> slicep_move;
std::vector<int8_t> prune_twist_slice, prune_flip_slice;
std::vector<int8_t> prune_cperm_slicep, prune_eperm_slicep;

template <typename SetF, typename GetF>
void build_move_table(int n, SetF set, GetF get, std::vector<uint16_t>& out) {
  out.assign(n * 18, 0);
  for (int v = 0; v < n; v++) {
    Cube c;
    set(c, v);
    for (int mv = 0; mv < 18; mv++) {
      Cube r = multiply(c, MOVE_CUBE[mv]);
      out[v * 18 + mv] = (uint16_t)get(r);
    }
  }
}

void build_prune(int n1, int n2, const std::vector<uint16_t>& mv1,
                 const std::vector<uint16_t>& mv2or,
                 const std::vector<uint8_t>* mv2small,
                 const int* moves, int nmoves, std::vector<int8_t>& out) {
  out.assign((size_t)n1 * n2, -1);
  std::vector<int> frontier{0};
  out[0] = 0;
  int depth = 0;
  size_t filled = 1;
  while (filled < out.size() && !frontier.empty()) {
    std::vector<int> next;
    for (int s : frontier) {
      int a = s / n2, b = s % n2;
      for (int k = 0; k < nmoves; k++) {
        int mv = moves[k];
        int a2 = mv1[a * 18 + mv];
        int b2 = mv2small ? (*mv2small)[b * 18 + mv] : mv2or[b * 18 + mv];
        int s2 = a2 * n2 + b2;
        if (out[s2] < 0) {
          out[s2] = (int8_t)(depth + 1);
          next.push_back(s2);
          filled++;
        }
      }
    }
    frontier.swap(next);
    depth++;
  }
}

const int ALL_MOVES[18] = {0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17};

bool g_init = false;
void init_tables() {
  if (g_init) return;
  init_moves();
  build_move_table(N_TWIST, set_twist, twist_of, twist_move);
  build_move_table(N_FLIP, set_flip, flip_of, flip_move);
  build_move_table(N_SLICE, set_udslice, udslice_of, slice_move);
  build_move_table(
      N_PERM8, [](Cube& c, int v) { set_perm8(c.cp.data(), v); },
      [](const Cube& c) { return cperm_of(c); }, cperm_move);
  build_move_table(
      N_PERM8, [](Cube& c, int v) { set_perm8(c.ep.data(), v); },
      [](const Cube& c) { return eperm_of(c); }, eperm_move);
  {
    slicep_move.assign(N_SLICEP * 18, 0);
    for (int v = 0; v < N_SLICEP; v++) {
      Cube c;
      set_sliceperm(c, v);
      for (int mv = 0; mv < 18; mv++) {
        Cube r = multiply(c, MOVE_CUBE[mv]);
        slicep_move[v * 18 + mv] = (uint8_t)sliceperm_of(r);
      }
    }
  }
  build_prune(N_TWIST, N_SLICE, twist_move, slice_move, nullptr,
              ALL_MOVES, 18, prune_twist_slice);
  build_prune(N_FLIP, N_SLICE, flip_move, slice_move, nullptr,
              ALL_MOVES, 18, prune_flip_slice);
  build_prune(N_PERM8, N_SLICEP, cperm_move, {}, &slicep_move,
              PHASE2_MOVES, 10, prune_cperm_slicep);
  build_prune(N_PERM8, N_SLICEP, eperm_move, {}, &slicep_move,
              PHASE2_MOVES, 10, prune_eperm_slicep);
  g_init = true;
}

// ---------------------------------------------------------------------------
// search
// ---------------------------------------------------------------------------
struct Search {
  int moves[40];
  int depth1;
  int max_total;
  int sol_len = -1;

  // phase 2 IDA*
  bool phase2(int cp, int ep, int sp, int depth, int togo, int last_face) {
    if (togo == 0) {
      if (cp == 0 && ep == 0 && sp == 0) { sol_len = depth; return true; }
      return false;
    }
    int h = std::max(prune_cperm_slicep[(size_t)cp * N_SLICEP + sp],
                     prune_eperm_slicep[(size_t)ep * N_SLICEP + sp]);
    if (h > togo) return false;
    for (int k = 0; k < 10; k++) {
      int mv = PHASE2_MOVES[k];
      int face = mv / 3;
      if (face == last_face || (face == 3 && last_face == 0) ||
          (face == 4 && last_face == 1) || (face == 5 && last_face == 2))
        continue;
      int cp2 = cperm_move[cp * 18 + mv];
      int ep2 = eperm_move[ep * 18 + mv];
      int sp2 = slicep_move[sp * 18 + mv];
      moves[depth] = mv;
      if (phase2(cp2, ep2, sp2, depth + 1, togo - 1, face)) return true;
    }
    return false;
  }

  // phase 1 IDA*; on reaching the H subgroup, run phase 2
  bool phase1(const Cube& start, int tw, int fl, int sl, int depth, int togo,
              int last_face) {
    if (togo == 0) {
      if (tw == 0 && fl == 0 && sl == 0) {
        // compute the cube after the phase-1 moves for phase-2 coords
        Cube c = start;
        for (int i = 0; i < depth; i++) c = multiply(c, MOVE_CUBE[moves[i]]);
        int cp = cperm_of(c), ep = eperm_of(c), sp = sliceperm_of(c);
        int h = std::max(prune_cperm_slicep[(size_t)cp * N_SLICEP + sp],
                         prune_eperm_slicep[(size_t)ep * N_SLICEP + sp]);
        for (int togo2 = h; depth + togo2 <= max_total; togo2++) {
          if (phase2(cp, ep, sp, depth, togo2,
                     depth ? moves[depth - 1] / 3 : -1)) {
            return true;
          }
        }
      }
      return false;
    }
    int h = std::max(prune_twist_slice[(size_t)tw * N_SLICE + sl],
                     prune_flip_slice[(size_t)fl * N_SLICE + sl]);
    if (h > togo) return false;
    for (int mv = 0; mv < 18; mv++) {
      int face = mv / 3;
      if (face == last_face || (face == 3 && last_face == 0) ||
          (face == 4 && last_face == 1) || (face == 5 && last_face == 2))
        continue;
      moves[depth] = mv;
      if (phase1(start, twist_move[tw * 18 + mv], flip_move[fl * 18 + mv],
                 slice_move[sl * 18 + mv], depth + 1, togo - 1, face))
        return true;
    }
    return false;
  }
};

// ---------------------------------------------------------------------------
// facelet parsing: 54 chars URFDLB order (kociemba convention)
// ---------------------------------------------------------------------------
// facelet positions of each corner/edge (U1..U9 R1.. etc, 0-indexed)
const int CORNER_FACELET[8][3] = {
    {8, 9, 20}, {6, 18, 38}, {0, 36, 47}, {2, 45, 11},
    {29, 26, 15}, {27, 44, 24}, {33, 53, 42}, {35, 17, 51},
};
const int EDGE_FACELET[12][2] = {
    {5, 10}, {7, 19}, {3, 37}, {1, 46}, {32, 16}, {28, 25},
    {30, 43}, {34, 52}, {23, 12}, {21, 41}, {50, 39}, {48, 14},
};
const char CORNER_COLOR[8][3] = {
    {'U','R','F'}, {'U','F','L'}, {'U','L','B'}, {'U','B','R'},
    {'D','F','R'}, {'D','L','F'}, {'D','B','L'}, {'D','R','B'},
};
const char EDGE_COLOR[12][2] = {
    {'U','R'}, {'U','F'}, {'U','L'}, {'U','B'}, {'D','R'}, {'D','F'},
    {'D','L'}, {'D','B'}, {'F','R'}, {'F','L'}, {'B','L'}, {'B','R'},
};

bool cube_from_facelets(const char* f, Cube& c) {
  // map facelet chars to face letters via the 6 centers
  char centers[6] = {f[4], f[13], f[22], f[31], f[40], f[49]};  // URFDLB
  auto face_of = [&](char ch) -> int {
    for (int i = 0; i < 6; i++) if (centers[i] == ch) return i;
    return -1;
  };
  const char FACE_CHARS[6] = {'U', 'R', 'F', 'D', 'L', 'B'};
  std::array<char, 54> g;
  for (int i = 0; i < 54; i++) {
    int face = face_of(f[i]);
    if (face < 0) return false;
    g[i] = FACE_CHARS[face];
  }
  c = Cube();
  // corners
  for (int i = 0; i < 8; i++) {
    int ori;
    char col[3];
    for (ori = 0; ori < 3; ori++) {
      if (g[CORNER_FACELET[i][ori]] == 'U' || g[CORNER_FACELET[i][ori]] == 'D')
        break;
    }
    if (ori >= 3) return false;
    col[0] = g[CORNER_FACELET[i][ori]];
    col[1] = g[CORNER_FACELET[i][(ori + 1) % 3]];
    col[2] = g[CORNER_FACELET[i][(ori + 2) % 3]];
    int j;
    for (j = 0; j < 8; j++) {
      if (col[0] == CORNER_COLOR[j][0] && col[1] == CORNER_COLOR[j][1] &&
          col[2] == CORNER_COLOR[j][2])
        break;
    }
    if (j >= 8) return false;
    c.cp[i] = (int8_t)j;
    c.co[i] = (int8_t)ori;
  }
  // edges
  for (int i = 0; i < 12; i++) {
    int j, ori = -1;
    for (j = 0; j < 12 && ori < 0; j++) {
      if (g[EDGE_FACELET[i][0]] == EDGE_COLOR[j][0] &&
          g[EDGE_FACELET[i][1]] == EDGE_COLOR[j][1]) { ori = 0; break; }
      if (g[EDGE_FACELET[i][0]] == EDGE_COLOR[j][1] &&
          g[EDGE_FACELET[i][1]] == EDGE_COLOR[j][0]) { ori = 1; break; }
    }
    if (ori < 0) return false;
    c.ep[i] = (int8_t)j;
    c.eo[i] = (int8_t)ori;
  }
  return true;
}

const char* MOVE_NAMES[18] = {
    "U", "U2", "U'", "R", "R2", "R'", "F", "F2", "F'",
    "D", "D2", "D'", "L", "L2", "L'", "B", "B2", "B'",
};

void cube_to_facelets(const Cube& c, char* f) {
  const char FACE_CHARS[6] = {'U', 'R', 'F', 'D', 'L', 'B'};
  for (int face = 0; face < 6; face++) f[face * 9 + 4] = FACE_CHARS[face];
  for (int i = 0; i < 8; i++) {
    int j = c.cp[i], ori = c.co[i];
    for (int n = 0; n < 3; n++)
      f[CORNER_FACELET[i][(n + ori) % 3]] = CORNER_COLOR[j][n];
  }
  for (int i = 0; i < 12; i++) {
    int j = c.ep[i], ori = c.eo[i];
    for (int n = 0; n < 2; n++)
      f[EDGE_FACELET[i][(n + ori) % 2]] = EDGE_COLOR[j][n];
  }
}

int parse_move(const char* s, int len) {
  const char faces[6] = {'U', 'R', 'F', 'D', 'L', 'B'};
  int face = -1;
  for (int i = 0; i < 6; i++) if (s[0] == faces[i]) face = i;
  if (face < 0) return -1;
  int turns = 1;
  if (len > 1 && s[1] == '2') turns = 2;
  else if (len > 1 && s[1] == '\'') turns = 3;
  return face * 3 + (turns - 1);
}

}  // namespace

extern "C" {

int rubik_init() {
  init_tables();
  return 1;
}

// Solve the cube given as a 54-char facelet string (URFDLB face order, 9
// facelets per face, row-major). Writes a space-separated move sequence to
// `out`. Returns the number of moves, or -1 on invalid input / no solution
// within max_depth.
int rubik_solve(const char* facelets, int max_depth, char* out, int out_len) {
  init_tables();
  if (!facelets || strlen(facelets) != 54) return -1;
  Cube c;
  if (!cube_from_facelets(facelets, c)) return -1;

  int tw = twist_of(c), fl = flip_of(c), sl = udslice_of(c);
  Search s;
  s.max_total = max_depth;
  for (int d1 = 0; d1 <= std::min(max_depth, 12); d1++) {
    if (s.phase1(c, tw, fl, sl, 0, d1, -1)) {
      std::string res;
      for (int i = 0; i < s.sol_len; i++) {
        if (i) res += " ";
        res += MOVE_NAMES[s.moves[i]];
      }
      if ((int)res.size() + 1 > out_len) return -1;
      memcpy(out, res.c_str(), res.size() + 1);
      return s.sol_len;
    }
  }
  return -1;
}

// Cross-check the coordinate move tables against the cubie model on random
// walks. Returns 0 if consistent, else a bitmask of failing tables.
int rubik_selftest(int n_steps, unsigned seed) {
  init_tables();
  Cube c;
  unsigned rng = seed;
  int bad = 0;
  int tw = twist_of(c), fl = flip_of(c), sl = udslice_of(c);
  for (int i = 0; i < n_steps; i++) {
    rng = rng * 1664525u + 1013904223u;
    int mv = (rng >> 8) % 18;
    tw = twist_move[tw * 18 + mv];
    fl = flip_move[fl * 18 + mv];
    sl = slice_move[sl * 18 + mv];
    c = multiply(c, MOVE_CUBE[mv]);
    if (tw != twist_of(c)) bad |= 1;
    if (fl != flip_of(c)) bad |= 2;
    if (sl != udslice_of(c)) bad |= 4;
  }
  // phase 2 walk
  c = Cube();
  int cp = cperm_of(c), ep = eperm_of(c), sp = sliceperm_of(c);
  for (int i = 0; i < n_steps; i++) {
    rng = rng * 1664525u + 1013904223u;
    int mv = PHASE2_MOVES[(rng >> 8) % 10];
    cp = cperm_move[cp * 18 + mv];
    ep = eperm_move[ep * 18 + mv];
    sp = slicep_move[sp * 18 + mv];
    c = multiply(c, MOVE_CUBE[mv]);
    if (cp != cperm_of(c)) bad |= 8;
    if (ep != eperm_of(c)) bad |= 16;
    if (sp != sliceperm_of(c)) bad |= 32;
  }
  return bad;
}

// Apply a space-separated move sequence (e.g. "U R2 F'") to the facelet
// string; writes the resulting 54-char facelet string (+NUL) to out.
// Returns 0 on success, -1 on invalid input.
int rubik_apply(const char* facelets, const char* moves, char* out) {
  init_tables();
  if (!facelets || strlen(facelets) != 54) return -1;
  Cube c;
  if (!cube_from_facelets(facelets, c)) return -1;
  const char* p = moves;
  while (*p) {
    while (*p == ' ') p++;
    if (!*p) break;
    const char* q = p;
    while (*q && *q != ' ') q++;
    int mv = parse_move(p, (int)(q - p));
    if (mv < 0) return -1;
    c = multiply(c, MOVE_CUBE[mv]);
    p = q;
  }
  cube_to_facelets(c, out);
  out[54] = '\0';
  return 0;
}

}  // extern "C"
