"""Host-side tier-rate analysis of the dense kernel on the bench scene.

Computes, in pure numpy (no TPU), for each 32-row sub-block of the
dense layout: the window tile span, the three per-column window extents,
and the resulting tier dispatch (dual / shared / full-width / sweep),
plus a cost model weighting each tier.  Explains where the measured
dense-kernel ms go without burning remote compiles.

Usage: python perf/dense_stats.py [tile ...]   (default 5.3 4.0)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N = 1_000_000
SUB_Q = 32
H = SUB_Q // 2
C = 128


def main():
    from bench import _bench_config
    from rmf_crowdsim_tpu.ops.zanlungo_dense import DenseConfig

    cfg = _bench_config(N)
    rng = np.random.default_rng(0)
    side = cfg.grid.width
    lim = side / 2 - 1.0
    pos = rng.uniform(-lim, lim, (N, 2)).astype(np.float32)
    eye = 2.0

    tiles = [float(t) for t in sys.argv[1:]] or [5.3, 4.0]
    for tile in tiles:
        d = DenseConfig.create(cfg.grid.width, cfg.grid.height,
                               cfg.grid.offset, cfg.max_eyesight, N,
                               tile_size=tile)
        tx, ty, cap = d.tx, d.ty, d.col_cap
        tcx = np.clip(((pos[:, 0] - d.offset[0]) / d.tile_size)
                      .astype(np.int64), 0, tx - 1)
        tcy = np.clip(((pos[:, 1] - d.offset[1]) / d.tile_size)
                      .astype(np.int64), 0, ty - 1)
        key = tcx * ty + tcy
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        pos_s = pos[order]
        tile_start = np.searchsorted(key_s, np.arange(tx * ty + 1))
        col_start = tile_start[::ty]
        col_len = col_start[1:] - col_start[:-1]

        # Per sub-block: query rows [cs + s*32, cs + s*32 + qn).
        stats = {"dual": 0, "shared": 0, "fullw": 0, "sweep": 0}
        ext_hist = []
        union_est = []
        for c in range(tx):
            cs, ln = col_start[c], col_len[c]
            nsub = int(np.ceil(ln / SUB_Q))
            for s in range(nsub):
                r0 = cs + s * SUB_Q
                r1 = min(r0 + SUB_Q, cs + ln)
                trow = (key_s[r0:r1] % ty)
                t_lo = max(trow.min() - 1, 0)
                t_hi = min(trow.max() + 1, ty - 1)
                m_ext = 0
                for k in (c - 1, c, c + 1):
                    if k < 0 or k >= tx:
                        continue
                    w0 = tile_start[k * ty + t_lo]
                    w1 = tile_start[k * ty + t_hi + 1]
                    m_ext = max(m_ext, w1 - w0)
                ext_hist.append(m_ext)
                if m_ext > C:
                    stats["sweep"] += 1
                    continue
                # bbox-union size estimate: agents of the 3 columns in
                # the dilated bbox of the halves (exact bbox test).
                q = pos_s[r0:r1]

                def ucount(qh):
                    lo = qh.min(0) - eye
                    hi = qh.max(0) + eye
                    cnt = 0
                    for k in (c - 1, c, c + 1):
                        if k < 0 or k >= tx:
                            continue
                        w0 = tile_start[k * ty + t_lo]
                        w1 = tile_start[k * ty + t_hi + 1]
                        p = pos_s[w0:w1]
                        # circle-vs-bbox approx: rectangle test
                        m = ((p[:, 0] >= lo[0]) & (p[:, 0] <= hi[0])
                             & (p[:, 1] >= lo[1]) & (p[:, 1] <= hi[1]))
                        cnt += int(m.sum())
                    return cnt
                if r1 - r0 > H:
                    c0, c1 = ucount(q[:H]), ucount(q[H:])
                else:
                    c0, c1 = ucount(q), 0
                union_est.append(c0 + c1)
                if c0 + c1 <= C:
                    stats["dual"] += 1
                elif ucount(q) <= C:
                    stats["shared"] += 1
                else:
                    stats["fullw"] += 1
        tot = sum(stats.values())
        eh = np.asarray(ext_hist)
        ue = np.asarray(union_est) if union_est else np.zeros(1)
        # cost model (arbitrary units per sub-block): dual 1, shared 1,
        # fullw 3 (3x128 direct), sweep = 2 passes * 3 strips * chunks.
        n_chunk = d.ext_strip // 256
        cost = (stats["dual"] + stats["shared"] + 3 * stats["fullw"]
                + stats["sweep"] * 2 * 3 * n_chunk)
        base = tot  # all-dual ideal
        print(f"tile={tile}: tx={tx} cap={cap} sub_blocks={tot}")
        print(f"  tiers: dual {stats['dual']/tot:.4f}  "
              f"shared {stats['shared']/tot:.4f}  "
              f"fullw {stats['fullw']/tot:.4f}  "
              f"sweep {stats['sweep']/tot:.5f}")
        print(f"  m_ext: p50 {np.percentile(eh, 50):.0f} "
              f"p95 {np.percentile(eh, 95):.0f} "
              f"p99 {np.percentile(eh, 99):.0f} "
              f"p99.9 {np.percentile(eh, 99.9):.0f} max {eh.max()}")
        print(f"  union(c0+c1): p50 {np.percentile(ue, 50):.0f} "
              f"p95 {np.percentile(ue, 95):.0f} max {ue.max():.0f}")
        print(f"  cost model: {cost / base:.2f}x all-dual ideal "
              f"(sweep chunks/strip {n_chunk})", flush=True)


if __name__ == "__main__":
    main()
