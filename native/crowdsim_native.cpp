// crowdsim_native — host-side route planner for the TPU crowd simulator.
//
// TPU-native replacement for the reference's route-planning stack, which is
// native Rust via the external `mapf` crate (consumed at
// rmf_crowdsim/src/rmf/mod.rs:12-30, 160-192):
//   - wall-segment rasterization onto an occupancy grid with Bresenham
//     (rmf/mod.rs:107-123),
//   - obstacle inflation by agent radius (rmf/mod.rs:126),
//   - point-to-point planning (mapf A* over a visibility graph).
//
// This is a from-scratch design, not a port.  The production mode plans
// EXACT shortest routes over the visibility graph of convex
// inflated-obstacle corners (matching mapf's optimality) with one
// precomputed corner graph shared by all queries, cached per-goal
// Dijkstra trees, and a sorted-candidate start connection that needs only
// a handful of line-of-sight tests per query (see plan_visibility).  Grid
// A* + exact line-of-sight string-pulling remains as the legacy mode and
// the fallback for endpoints the corner graph cannot connect.  Routes
// land in padded device arrays consumed by the jitted WaypointFollow
// planner, so the per-step waypoint chase is a pure gather.
//
// Zero dependencies; C API for ctypes.  Build: make (g++ -O2 -shared).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <queue>
#include <utility>
#include <vector>

namespace {

// Shortest-distance-to-goal tree over the corner visibility graph:
// dist[c] = exact shortest path length corner c -> goal, next[c] = the
// following corner on that path (-1: straight to the goal).
struct GoalTree {
  std::vector<double> dist;
  std::vector<int32_t> next;
};

struct Planner {
  double cell_size;
  double ox, oy;     // world coords of cell (0,0) corner
  int nx = 0, ny = 0;
  std::vector<uint8_t> occ;       // raw rasterized walls
  std::vector<uint8_t> inflated;  // occ dilated by inflation radius

  // Exact visibility-graph planner state (built lazily on the first
  // plan that isn't a straight shot; see build_graph()).
  int mode = 0;  // 0 = exact visibility graph (default), 1 = legacy grid A*
  double eps = 0.0;          // corner nudge into free space
  bool graph_built = false;
  std::vector<double> node_x, node_y;        // convex corner nodes
  std::vector<int32_t> adj_off, adj_idx;     // CSR corner-corner edges
  std::vector<double> adj_w;
  std::map<std::pair<double, double>, GoalTree> goal_cache;

  inline bool in_bounds(int x, int y) const {
    return x >= 0 && x < nx && y >= 0 && y < ny;
  }
  inline bool blocked(int x, int y) const {
    // Out-of-grid is traversable: the reference's SparseGrid is unbounded
    // and unmarked cells are free.
    if (!in_bounds(x, y)) return false;
    return inflated[(size_t)x * ny + y] != 0;
  }
  inline int cx(double wx) const {
    return (int)std::floor((wx - ox) / cell_size);
  }
  inline int cy(double wy) const {
    return (int)std::floor((wy - oy) / cell_size);
  }
  inline double wx(int cx) const { return ox + (cx + 0.5) * cell_size; }
  inline double wy(int cy) const { return oy + (cy + 0.5) * cell_size; }
};

// Bresenham over cells, inclusive of both endpoints — the reference uses
// the line_drawing crate's Bresenham for wall rasterization
// (rmf/mod.rs:108-122).
void bresenham(int x0, int y0, int x1, int y1,
               std::vector<std::pair<int, int>>* out) {
  int dx = std::abs(x1 - x0), sx = x0 < x1 ? 1 : -1;
  int dy = -std::abs(y1 - y0), sy = y0 < y1 ? 1 : -1;
  int err = dx + dy;
  int x = x0, y = y0;
  while (true) {
    out->emplace_back(x, y);
    if (x == x1 && y == y1) break;
    int e2 = 2 * err;
    if (e2 >= dy) { err += dy; x += sx; }
    if (e2 <= dx) { err += dx; y += sy; }
  }
}

// Exact segment-vs-blocked-cells test on the *inflated* grid (supercover:
// visits every cell the segment passes through, unlike Bresenham which can
// diagonal-skip).  Used for string-pulling shortcuts.
bool line_of_sight(const Planner& p, double ax, double ay, double bx,
                   double by) {
  // March the segment in grid space visiting each crossed cell boundary.
  double x0 = (ax - p.ox) / p.cell_size, y0 = (ay - p.oy) / p.cell_size;
  double x1 = (bx - p.ox) / p.cell_size, y1 = (by - p.oy) / p.cell_size;
  int cx = (int)std::floor(x0), cy = (int)std::floor(y0);
  int gx = (int)std::floor(x1), gy = (int)std::floor(y1);
  double dx = x1 - x0, dy = y1 - y0;
  int sx = dx > 0 ? 1 : -1, sy = dy > 0 ? 1 : -1;
  double tMaxX, tMaxY, tDeltaX, tDeltaY;
  if (dx != 0) {
    double next_vx = (sx > 0) ? (cx + 1) : cx;
    tMaxX = (next_vx - x0) / dx;
    tDeltaX = std::abs(1.0 / dx);
  } else { tMaxX = 2.0; tDeltaX = 2.0; }
  if (dy != 0) {
    double next_vy = (sy > 0) ? (cy + 1) : cy;
    tMaxY = (next_vy - y0) / dy;
    tDeltaY = std::abs(1.0 / dy);
  } else { tMaxY = 2.0; tDeltaY = 2.0; }

  if (p.blocked(cx, cy)) return false;
  // The walk advances >= 1 cell toward the goal per iteration, so the
  // exact bound is the cell Manhattan distance (a grid-size cap would
  // spuriously fail long free segments whose endpoints lie far outside
  // the raster — out-of-grid cells are traversable).
  const long long need = std::llabs((long long)gx - cx)
      + std::llabs((long long)gy - cy) + 8;
  for (long long it = 0; it < need; ++it) {
    if (cx == gx && cy == gy) return true;
    if (tMaxX < tMaxY) { tMaxX += tDeltaX; cx += sx; }
    else if (tMaxY < tMaxX) { tMaxY += tDeltaY; cy += sy; }
    else {
      // Exact corner crossing: both cells adjacent to the corner must be
      // free (no diagonal squeezing through touching obstacles).
      if (p.blocked(cx + sx, cy) && p.blocked(cx, cy + sy)) return false;
      tMaxX += tDeltaX; tMaxY += tDeltaY; cx += sx; cy += sy;
    }
    if (p.blocked(cx, cy)) return false;
  }
  return cx == gx && cy == gy;
}

struct Node {
  double f;
  int idx;
  bool operator<(const Node& o) const { return f > o.f; }  // min-heap
};

// --- Exact visibility-graph machinery ---------------------------------------
//
// The reference plans over a true visibility graph (mapf's `Visibility`
// built from the inflated SparseGrid, rmf/mod.rs:126, A* at
// rmf/mod.rs:160-192), so its routes are shortest polygonal paths around
// inflated corners.  This planner does the same, in the grid world model:
// Dijkstra/A* over the visibility graph of CONVEX inflated-obstacle
// corners (each nudged eps into free space so grazing segments don't clip
// blocked cells).  By the taut-path argument the continuous optimum bends
// only at convex corners, so the graph optimum IS the true optimum up to
// the O(eps) nudges — tests/test_route_quality.py asserts ratio == 1 vs
// the independent tests/visibility_oracle.py.  Grid A* + string-pulling
// (plan_grid below) remains as fallback for endpoints the graph can't
// connect and as the legacy mode (cs_set_mode).

// Heap entry ordered by (dist, idx) — the idx tie-break keeps C++ and the
// NumpyRoutePlanner twin bit-identical on equal-cost alternatives.
struct DNode {
  double d;
  int idx;
  bool operator<(const DNode& o) const {
    return d != o.d ? d > o.d : idx > o.idx;  // min-heap
  }
};

double dist2d(double ax, double ay, double bx, double by) {
  double dx = bx - ax, dy = by - ay;
  return std::sqrt(dx * dx + dy * dy);
}

// Enumerate convex corner nodes and the corner-corner visibility edges.
// A lattice corner (i, j), i in 0..nx, j in 0..ny, touches cells
// (i-1, j-1), (i, j-1), (i-1, j), (i, j) (out-of-grid cells are free);
// it is a convex corner iff EXACTLY one of the four is blocked, and the
// node is nudged eps diagonally away from the blocked quadrant
// (tests/visibility_oracle.py uses the identical enumeration).
void build_graph(Planner& p) {
  if (p.graph_built) return;
  p.graph_built = true;
  p.eps = 0.03 * p.cell_size;
  auto occ_at = [&](int x, int y) -> bool {
    if (x < 0 || x >= p.nx || y < 0 || y >= p.ny) return false;
    return p.inflated[(size_t)x * p.ny + y] != 0;
  };
  for (int i = 0; i <= p.nx; ++i) {
    for (int j = 0; j <= p.ny; ++j) {
      bool q0 = occ_at(i - 1, j - 1), q1 = occ_at(i, j - 1);
      bool q2 = occ_at(i - 1, j), q3 = occ_at(i, j);
      if ((int)q0 + q1 + q2 + q3 != 1) continue;
      int k = q0 ? 0 : (q1 ? 1 : (q2 ? 2 : 3));
      double sx = (k == 1 || k == 3) ? -1.0 : 1.0;
      double sy = (k == 2 || k == 3) ? -1.0 : 1.0;
      p.node_x.push_back(p.ox + i * p.cell_size + sx * p.eps);
      p.node_y.push_back(p.oy + j * p.cell_size + sy * p.eps);
    }
  }
  const int v = (int)p.node_x.size();
  std::vector<std::vector<int32_t>> adj(v);
  for (int a = 0; a < v; ++a)
    for (int b = a + 1; b < v; ++b)
      if (line_of_sight(p, p.node_x[a], p.node_y[a], p.node_x[b],
                        p.node_y[b])) {
        adj[a].push_back(b);
        adj[b].push_back(a);
      }
  p.adj_off.assign(v + 1, 0);
  for (int a = 0; a < v; ++a)
    p.adj_off[a + 1] = p.adj_off[a] + (int32_t)adj[a].size();
  p.adj_idx.reserve(p.adj_off[v]);
  p.adj_w.reserve(p.adj_off[v]);
  for (int a = 0; a < v; ++a)
    for (int32_t b : adj[a]) {
      p.adj_idx.push_back(b);
      p.adj_w.push_back(
          dist2d(p.node_x[a], p.node_y[a], p.node_x[b], p.node_y[b]));
    }
}

// Shortest corner->goal distances (Dijkstra from the goal over the corner
// graph, seeded with the goal->corner visibility edges).  Cached per goal:
// route queries share few distinct goals (sinks/waypoints), so the
// per-start work reduces to a sorted candidate scan (see plan_visibility).
const GoalTree& goal_tree(Planner& p, double gx, double gy) {
  auto key = std::make_pair(gx, gy);
  auto it = p.goal_cache.find(key);
  if (it != p.goal_cache.end()) return it->second;
  const int v = (int)p.node_x.size();
  GoalTree t;
  t.dist.assign(v, 1e18);
  t.next.assign(v, -1);
  std::priority_queue<DNode> heap;
  for (int c = 0; c < v; ++c)
    if (line_of_sight(p, gx, gy, p.node_x[c], p.node_y[c])) {
      t.dist[c] = dist2d(gx, gy, p.node_x[c], p.node_y[c]);
      heap.push({t.dist[c], c});
    }
  std::vector<uint8_t> done(v, 0);
  while (!heap.empty()) {
    DNode nd = heap.top();
    heap.pop();
    if (done[nd.idx]) continue;
    done[nd.idx] = 1;
    for (int32_t e = p.adj_off[nd.idx]; e < p.adj_off[nd.idx + 1]; ++e) {
      int32_t b = p.adj_idx[e];
      double ndist = nd.d + p.adj_w[e];
      if (ndist < t.dist[b]) {
        t.dist[b] = ndist;
        t.next[b] = nd.idx;
        heap.push({ndist, b});
      }
    }
  }
  return p.goal_cache.emplace(key, std::move(t)).first->second;
}

// Exact visibility plan.  Returns the waypoint count (>= 2), -2 on
// overflow, or 0 when the graph cannot connect the endpoints (caller
// falls back to grid A*, which also decides true unreachability).
int plan_visibility(Planner& p, double sx, double sy, double gx, double gy,
                    double* out_xy, int max_pts) {
  build_graph(p);
  const int v = (int)p.node_x.size();
  if (v == 0) return 0;
  const GoalTree& t = goal_tree(p, gx, gy);
  // Candidate first corners sorted by |s->c| + dist(c->goal): that sum is
  // the TOTAL route cost if c is visible from s, so the first visible
  // candidate in ascending order is the exact optimum — typically after
  // 1-5 line-of-sight tests instead of v.
  std::vector<std::pair<double, int>> cand;
  cand.reserve(v);
  for (int c = 0; c < v; ++c)
    if (t.dist[c] < 1e17)
      cand.emplace_back(
          dist2d(sx, sy, p.node_x[c], p.node_y[c]) + t.dist[c], c);
  std::sort(cand.begin(), cand.end());
  for (auto& pr : cand) {
    int c = pr.second;
    if (!line_of_sight(p, sx, sy, p.node_x[c], p.node_y[c])) continue;
    std::vector<std::pair<double, double>> out;
    out.emplace_back(sx, sy);
    for (int cur = c; cur != -1; cur = t.next[cur])
      out.emplace_back(p.node_x[cur], p.node_y[cur]);
    out.emplace_back(gx, gy);
    if ((int)out.size() > max_pts) return -2;
    for (size_t i = 0; i < out.size(); ++i) {
      out_xy[2 * i] = out[i].first;
      out_xy[2 * i + 1] = out[i].second;
    }
    return (int)out.size();
  }
  return 0;
}

}  // namespace

extern "C" {

// Build a planner from wall segments.
//   verts: [n_verts * 2] doubles (x, y) — RMF building vertices
//          (rmf/mod.rs:137-147 parses these from levels.L1.vertices).
//   walls: [n_walls * 2] ints — vertex-index pairs (levels.L1.walls).
//   cell_size: occupancy raster resolution (the reference's `scale`).
//   inflation: agent radius the obstacles are inflated by (rmf/mod.rs:126).
void* cs_create(const double* verts, int n_verts, const int* walls,
                int n_walls, double cell_size, double inflation) {
  auto* p = new Planner();
  p->cell_size = cell_size;

  double minx = 0, miny = 0, maxx = 0, maxy = 0;
  if (n_verts > 0) {
    minx = maxx = verts[0];
    miny = maxy = verts[1];
    for (int i = 1; i < n_verts; ++i) {
      minx = std::min(minx, verts[2 * i]);
      maxx = std::max(maxx, verts[2 * i]);
      miny = std::min(miny, verts[2 * i + 1]);
      maxy = std::max(maxy, verts[2 * i + 1]);
    }
  }
  double margin = inflation + 4.0 * cell_size;
  p->ox = minx - margin;
  p->oy = miny - margin;
  p->nx = std::max(1, (int)std::ceil((maxx + margin - p->ox) / cell_size));
  p->ny = std::max(1, (int)std::ceil((maxy + margin - p->oy) / cell_size));
  p->occ.assign((size_t)p->nx * p->ny, 0);

  std::vector<std::pair<int, int>> cells;
  for (int w = 0; w < n_walls; ++w) {
    int a = walls[2 * w], b = walls[2 * w + 1];
    if (a < 0 || a >= n_verts || b < 0 || b >= n_verts) continue;
    cells.clear();
    bresenham(p->cx(verts[2 * a]), p->cy(verts[2 * a + 1]),
              p->cx(verts[2 * b]), p->cy(verts[2 * b + 1]), &cells);
    for (auto& c : cells)
      if (p->in_bounds(c.first, c.second))
        p->occ[(size_t)c.first * p->ny + c.second] = 1;
  }

  // Inflate by Euclidean disc over cell centers (the reference hands the
  // radius to mapf's Visibility, rmf/mod.rs:126).
  p->inflated = p->occ;
  int r = (int)std::ceil(inflation / cell_size);
  if (r > 0) {
    std::vector<std::pair<int, int>> disc;
    for (int dx = -r; dx <= r; ++dx)
      for (int dy = -r; dy <= r; ++dy)
        if ((double)dx * dx + (double)dy * dy <= (double)r * r)
          disc.emplace_back(dx, dy);
    for (int x = 0; x < p->nx; ++x)
      for (int y = 0; y < p->ny; ++y)
        if (p->occ[(size_t)x * p->ny + y])
          for (auto& d : disc) {
            int xx = x + d.first, yy = y + d.second;
            if (p->in_bounds(xx, yy))
              p->inflated[(size_t)xx * p->ny + yy] = 1;
          }
  }
  return p;
}

void cs_destroy(void* h) { delete (Planner*)h; }

int cs_grid_dims(void* h, double* out4) {
  auto* p = (Planner*)h;
  out4[0] = p->ox; out4[1] = p->oy;
  out4[2] = p->nx; out4[3] = p->ny;
  return 0;
}

int cs_occupied(void* h, double x, double y) {
  auto* p = (Planner*)h;
  return p->blocked(p->cx(x), p->cy(y)) ? 1 : 0;
}

// Select the planning algorithm: 0 = exact visibility graph (default,
// the reference's mapf semantics), 1 = legacy grid A* + string-pulling
// (kept for A/B and as the in-plan fallback).
void cs_set_mode(void* h, int mode) { ((Planner*)h)->mode = mode; }

// Plan a route from (sx, sy) to (gx, gy).  Writes up to max_pts (x, y)
// pairs to out_xy, including both endpoints.  Returns the number of
// waypoints, or -1 if no route exists (mapf Status::Impossible,
// rmf/mod.rs:189), or -2 if out_xy is too small.
int cs_plan(void* h, double sx, double sy, double gx, double gy,
            double* out_xy, int max_pts) {
  auto* p = (Planner*)h;
  int scx = p->cx(sx), scy = p->cy(sy);
  int gcx = p->cx(gx), gcy = p->cy(gy);

  // Degenerate / trivial: straight shot.
  if (line_of_sight(*p, sx, sy, gx, gy)) {
    if (max_pts < 2) return -2;
    out_xy[0] = sx; out_xy[1] = sy; out_xy[2] = gx; out_xy[3] = gy;
    return 2;
  }

  if (p->mode == 0 && !p->blocked(scx, scy) && !p->blocked(gcx, gcy)) {
    int n = plan_visibility(*p, sx, sy, gx, gy, out_xy, max_pts);
    if (n != 0) return n;  // exact route or -2 overflow
    // n == 0: graph couldn't connect the endpoints (e.g. a corner-free
    // enclosure) — grid A* below decides reachability.
  }

  // Clamp endpoints into the grid for the A* phase (world outside the
  // grid is free space; the straight-shot test above already handles
  // fully-outside routes).
  auto clampi = [](int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  scx = clampi(scx, 0, p->nx - 1); scy = clampi(scy, 0, p->ny - 1);
  gcx = clampi(gcx, 0, p->nx - 1); gcy = clampi(gcy, 0, p->ny - 1);
  if (p->blocked(scx, scy) || p->blocked(gcx, gcy)) return -1;

  const size_t n = (size_t)p->nx * p->ny;
  std::vector<double> dist(n, 1e18);
  std::vector<int32_t> parent(n, -1);
  std::priority_queue<Node> open;

  auto id = [&](int x, int y) { return x * p->ny + y; };
  auto h8 = [&](int x, int y) {  // octile heuristic
    double dx = std::abs(x - gcx), dy = std::abs(y - gcy);
    return (dx + dy) + (M_SQRT2 - 2.0) * std::min(dx, dy);
  };

  int start = id(scx, scy), goal = id(gcx, gcy);
  dist[start] = 0.0;
  open.push({h8(scx, scy), start});
  static const int DX[8] = {1, -1, 0, 0, 1, 1, -1, -1};
  static const int DY[8] = {0, 0, 1, -1, 1, -1, 1, -1};
  static const double DC[8] = {1, 1, 1, 1, M_SQRT2, M_SQRT2, M_SQRT2,
                               M_SQRT2};
  while (!open.empty()) {
    Node nd = open.top();
    open.pop();
    int cur = nd.idx;
    int cx = cur / p->ny, cy = cur % p->ny;
    if (cur == goal) break;
    if (nd.f > dist[cur] + h8(cx, cy) + 1e-9) continue;  // stale
    for (int k = 0; k < 8; ++k) {
      int nx2 = cx + DX[k], ny2 = cy + DY[k];
      if (!p->in_bounds(nx2, ny2) || p->blocked(nx2, ny2)) continue;
      // No diagonal corner-cutting through blocked orthogonals.
      if (k >= 4 && (p->blocked(cx + DX[k], cy) || p->blocked(cx, cy + DY[k])))
        continue;
      double ndist = dist[cur] + DC[k];
      int nid = id(nx2, ny2);
      if (ndist < dist[nid]) {
        dist[nid] = ndist;
        parent[nid] = cur;
        open.push({ndist + h8(nx2, ny2), nid});
      }
    }
  }
  if (parent[goal] == -1 && goal != start) return -1;

  // Reconstruct cell-center path, world endpoints exact.
  std::vector<std::pair<double, double>> path;
  path.emplace_back(gx, gy);
  for (int cur = (goal == start) ? -1 : parent[goal]; cur != -1 && cur != start;
       cur = parent[cur])
    path.emplace_back(p->wx(cur / p->ny), p->wy(cur % p->ny));
  path.emplace_back(sx, sy);
  std::reverse(path.begin(), path.end());

  // String-pulling: greedily extend exact line-of-sight from each anchor.
  std::vector<std::pair<double, double>> out;
  size_t anchor = 0;
  out.push_back(path[0]);
  while (anchor + 1 < path.size()) {
    size_t far = anchor + 1;
    for (size_t j = path.size() - 1; j > anchor; --j) {
      if (line_of_sight(*p, path[anchor].first, path[anchor].second,
                        path[j].first, path[j].second)) {
        far = j;
        break;
      }
    }
    out.push_back(path[far]);
    anchor = far;
  }

  if ((int)out.size() > max_pts) return -2;
  for (size_t i = 0; i < out.size(); ++i) {
    out_xy[2 * i] = out[i].first;
    out_xy[2 * i + 1] = out[i].second;
  }
  return (int)out.size();
}

}  // extern "C"
