"""Multi-room routing demo — BASELINE.md config 4: RMF building YAML +
Zanlungo avoidance, agents streaming between rooms through doorways.

A 40x20 building with two internal walls leaving door gaps; SourceSinks
stream agents from the left room to the right room and back.  Routes come
from the native C++ A* planner; avoidance from the Zanlungo model (the
fused Pallas kernel when --backend grid_pallas).

Usage:
    python examples/multi_room.py [--agents-rate 2.0] [--steps 400]
                                  [--backend grid] [--png /tmp/rooms.png]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BUILDING_YAML = """
levels:
  L1:
    vertices:
      - [0.0, 0.0]      # 0 outer box
      - [40.0, 0.0]     # 1
      - [40.0, 20.0]    # 2
      - [0.0, 20.0]     # 3
      - [14.0, 0.0]     # 4 wall A bottom (door gap 8..12 high)
      - [14.0, 8.0]     # 5
      - [14.0, 12.0]    # 6
      - [14.0, 20.0]    # 7
      - [27.0, 0.0]     # 8 wall B bottom (door gap 10..14 high)
      - [27.0, 10.0]    # 9
      - [27.0, 14.0]    # 10
      - [27.0, 20.0]    # 11
    walls:
      - [0, 1]
      - [1, 2]
      - [2, 3]
      - [3, 0]
      - [4, 5]
      - [6, 7]
      - [8, 9]
      - [10, 11]
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents-rate", type=float, default=0.6)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=0.25)
    ap.add_argument("--backend", default="grid")
    ap.add_argument("--png", default=None)
    args = ap.parse_args()

    from rmf_crowdsim_tpu import (
        EventListener,
        GridConfig,
        PoissonCrowd,
        RMFPlanner,
        SimConfig,
        Simulation,
        SourceSink,
        Zanlungo,
    )

    planner = RMFPlanner.from_yaml(BUILDING_YAML, inflation=0.0, scale=0.5,
                                   agent_radius=0.3, arrival_tolerance=0.4)
    # force_cap: our extension — the reference's 1e15 clamp flings
    # overlapping agents to ~1e14 positions (see ZanlungoParams docs).
    lp = Zanlungo(agent_scale=2.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.3,
                  force_cap=6.0)
    cfg = SimConfig(
        capacity=256,
        grid=GridConfig(width=48.0, height=28.0, cell_size=2.0,
                        offset=(-4.0, -4.0)),
        neighbor_backend=args.backend,
        max_per_cell=32,
        max_eyesight=2.0,
    )
    sim = Simulation(cfg)

    class Counter(EventListener):
        spawned = destroyed = waypoints = 0

        def agent_spawned(self, p, i):
            Counter.spawned += 1

        def agent_destroyed(self, i):
            Counter.destroyed += 1

        def waypoint_reached(self, p, i):
            Counter.waypoints += 1

    sim.add_event_listener(Counter())

    # Left room -> far right room, via both doors; and the reverse flow.
    sim.add_source_sink(SourceSink(
        source=(4.0, 4.0), waypoints=[(20.0, 10.0), (36.0, 16.0)],
        radius_sink=1.0, crowd_generator=PoissonCrowd(args.agents_rate),
        high_level_planner=planner, local_planner=lp,
        agent_eyesight_range=2.0))
    sim.add_source_sink(SourceSink(
        source=(36.0, 4.0), waypoints=[(20.0, 10.0), (4.0, 16.0)],
        radius_sink=1.0, crowd_generator=PoissonCrowd(args.agents_rate),
        high_level_planner=planner, local_planner=lp,
        agent_eyesight_range=2.0))

    trail = []
    for step in range(args.steps):
        sim.step(args.dt)
        if step % 40 == 0:
            print(f"t={sim.sim_time:6.1f}s agents={sim.num_agents:4d} "
                  f"spawned={Counter.spawned} arrived={Counter.destroyed}")
        if args.png and step % 4 == 0:
            trail.append([v.position for v in sim.agents.values()])

    print(f"done: {Counter.spawned} spawned, {Counter.destroyed} arrived, "
          f"{Counter.waypoints} waypoint hits, {planner.n_routes} routes "
          f"planned")

    if args.png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
        import yaml

        doc = yaml.safe_load(BUILDING_YAML)
        verts = doc["levels"]["L1"]["vertices"]
        fig, ax = plt.subplots(figsize=(8, 4.5), dpi=100)
        for a, b in doc["levels"]["L1"]["walls"]:
            ax.plot([verts[a][0], verts[b][0]], [verts[a][1], verts[b][1]],
                    "k-", lw=2)
        for i, pts in enumerate(trail):
            if not pts:
                continue
            p = np.asarray(pts)
            ax.scatter(p[:, 0], p[:, 1], s=4,
                       alpha=min(1.0, 0.1 + 0.9 * i / max(1, len(trail) - 1)),
                       c="#7B3FF2", edgecolors="none")
        ax.set_aspect("equal")
        ax.set_title("multi-room routing (trails lighten with time)")
        fig.savefig(args.png, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
