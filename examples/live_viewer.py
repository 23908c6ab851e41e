"""Real-time interactive viewer — the reference's windowed demo app,
TPU-native (rmf_crowdsim_viz/src/main.rs:96-129).

The reference opens a nannou window, steps the simulation with the
wall-clock time since the last frame (``update.since_last``,
main.rs:104-110), and draws a plum 20 px ellipse per agent on a
cornflower-blue background (main.rs:112-129).  This mirrors it with a
matplotlib animation window:

- each frame steps the sim by the measured wall-clock dt (real time);
- agents are plum discs on cornflower blue;
- any scene works — default is the "threes-a-crowd" demo model
  (main.rs:64-94) with the sane-radius variant (see
  examples/threes_a_crowd.py for why the reference's own radius-20
  parameters fling its agents to infinity).

On a headless machine (no $DISPLAY / Agg backend) there is no window to
open; pass ``--seconds N --gif out.gif`` to run the same wall-clock-dt
loop off-screen and save what the window would have shown.

Usage:
    python examples/live_viewer.py                  # interactive window
    python examples/live_viewer.py --seconds 5 --gif /tmp/live.gif
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

CORNFLOWER = "#6495ED"
PLUM = "#DDA0DD"


def build_sim():
    from examples.threes_a_crowd import build

    return build(reference_params=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0.0,
                    help="run headless for N wall-clock seconds")
    ap.add_argument("--gif", default=None, help="save the headless run")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--lim", type=float, default=60.0,
                    help="view half-extent (world units)")
    args = ap.parse_args()

    sim = build_sim()
    headless = matplotlib.get_backend().lower() == "agg"

    fig, ax = plt.subplots(figsize=(6, 6))
    fig.patch.set_facecolor(CORNFLOWER)
    ax.set_facecolor(CORNFLOWER)
    ax.set_xlim(-args.lim, args.lim)
    ax.set_ylim(-args.lim, args.lim)
    ax.set_aspect("equal")
    ax.set_title("rmf_crowdsim_tpu — live (wall-clock dt)")
    scat = ax.scatter([], [], s=120, c=PLUM, edgecolors="none")

    state = {"last": time.perf_counter()}

    def frame(_i):
        now = time.perf_counter()
        dt = now - state["last"]  # update.since_last (main.rs:107)
        state["last"] = now
        sim.step(max(dt, 1e-6))
        agents = sim.agents
        if agents:
            pts = np.asarray([a.position for a in agents.values()])
        else:
            pts = np.zeros((0, 2))
        scat.set_offsets(pts)
        return (scat,)

    if headless or args.seconds:
        frames = []
        t_end = time.perf_counter() + (args.seconds or 3.0)
        while time.perf_counter() < t_end:
            frame(0)
            if args.gif:
                fig.canvas.draw()
                buf = np.asarray(fig.canvas.buffer_rgba())
                frames.append(buf.copy())
            time.sleep(max(0.0, 1.0 / args.fps))
        print(f"ran {len(frames) or 'headless'} frames; "
              f"{sim.num_agents} agents alive at t={sim.sim_time:.2f}s")
        if args.gif and frames:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in frames]
            imgs[0].save(args.gif, save_all=True, append_images=imgs[1:],
                         duration=int(1000 / args.fps), loop=0)
            print(f"wrote {args.gif}")
        return

    from matplotlib.animation import FuncAnimation

    _anim = FuncAnimation(fig, frame, interval=1000.0 / args.fps,
                          cache_frame_data=False)
    plt.show()


if __name__ == "__main__":
    main()
