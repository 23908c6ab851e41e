"""Exact visibility-graph shortest-path oracle (test-only, small worlds).

The reference plans over a true visibility graph (mapf's ``Visibility``
built from the inflated occupancy SparseGrid, rmf/mod.rs:126, consumed
by A* at rmf/mod.rs:160-192) and therefore returns (near-)optimal
Euclidean routes.  The shipped planner (native/crowdsim_native.cpp and
its NumpyRoutePlanner twin) instead runs grid-A* + line-of-sight
string-pulling, which can pay cell-center detours or commit to a
suboptimal homotopy class on corner-heavy worlds.  This oracle bounds
that gap: it computes the EXACT shortest path in the same world model —
the planner's own inflated occupancy grid with its own line-of-sight
predicate — via Dijkstra over the visibility graph of convex obstacle
corners (nudged epsilon into free space so grazing segments don't clip
blocked cells).

By the classic taut-path argument, the continuous shortest obstacle-
avoiding path bends only at (convex) obstacle corners, so the graph
optimum equals the true optimum up to the O(epsilon) corner nudges.
"""

from __future__ import annotations

import heapq
import math


class VisibilityOracle:
    """Wraps a NumpyRoutePlanner/NativeRoutePlanner-shaped planner that
    exposes ``inflated`` (occupancy grid), ``ox/oy/cell/nx/ny`` and
    ``_line_of_sight`` (the numpy fallback does; use it as the world
    model even when testing the native planner — they are parity-tested
    against each other)."""

    def __init__(self, world, eps_cells: float = 0.03):
        self.w = world
        self.eps = eps_cells * world.cell
        self.nodes = self._corner_nodes()

    def _corner_nodes(self):
        w = self.w
        occ = w.inflated
        nodes = []
        # A lattice corner point (i, j) touches cells (i-1..i, j-1..j).
        # It is a CONVEX corner iff exactly one of the four cells is
        # blocked; the node is nudged into the diagonally opposite free
        # cell.
        import numpy as np

        blocked = np.zeros((w.nx + 2, w.ny + 2), bool)
        blocked[1:-1, 1:-1] = occ
        for i in range(w.nx + 1):
            for j in range(w.ny + 1):
                quad = [
                    blocked[i, j],          # cell (i-1, j-1)
                    blocked[i + 1, j],      # cell (i,   j-1)
                    blocked[i, j + 1],      # cell (i-1, j)
                    blocked[i + 1, j + 1],  # cell (i,   j)
                ]
                if sum(quad) != 1:
                    continue
                k = quad.index(True)
                # Nudge away from the single blocked quadrant.
                sx = -1.0 if k in (1, 3) else 1.0
                sy = -1.0 if k in (2, 3) else 1.0
                nodes.append((
                    w.ox + i * w.cell + sx * self.eps,
                    w.oy + j * w.cell + sy * self.eps,
                ))
        return nodes

    def shortest_cost(self, start, goal):
        """Exact shortest LOS-path cost start -> goal, or None if
        unreachable in the visibility graph."""
        w = self.w
        pts = [tuple(map(float, start)), tuple(map(float, goal))]
        pts += self.nodes
        n = len(pts)
        if w._line_of_sight(*pts[0], *pts[1]):
            return math.dist(pts[0], pts[1])
        # Dijkstra with lazy edge relaxation (LOS evaluated on pop).
        dist = [math.inf] * n
        dist[0] = 0.0
        done = [False] * n
        heap = [(0.0, 0)]
        while heap:
            d, u = heapq.heappop(heap)
            if done[u]:
                continue
            done[u] = True
            if u == 1:
                return d
            ux, uy = pts[u]
            for v in range(n):
                if done[v]:
                    continue
                nd = d + math.dist(pts[u], pts[v])
                if nd < dist[v] and w._line_of_sight(ux, uy, *pts[v]):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        return None


def path_cost(path):
    return sum(
        math.dist(path[i], path[i + 1]) for i in range(len(path) - 1)
    )
