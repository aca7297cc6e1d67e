"""Pure-numpy micro-benchmark of part-block kernel variants on realistic
RMAT-20 block data (no Spark): generates the oriented graph, hash-blocks
sources, and times each intersection kernel on a few blocks.

Usage: python scripts/kernel_micro.py [scale] [n_blocks]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def rmat(scale: int, edge_factor: int = 16, seed: int = 42):
    rng = np.random.default_rng(seed)
    n = 1 << scale
    m = edge_factor * n
    a, b, c = 0.57, 0.19, 0.19
    src = np.zeros(2 * m, dtype=np.int64)
    dst = np.zeros(2 * m, dtype=np.int64)
    for _bit in range(scale):
        r = rng.random(2 * m)
        sbit = (r >= a + b).astype(np.int64)
        r2 = rng.random(2 * m)
        dbit = np.where(
            sbit == 0, (r2 >= a / (a + b)).astype(np.int64),
            (r2 >= c / (1 - a - b)).astype(np.int64),
        )
        src = (src << 1) | sbit
        dst = (dst << 1) | dbit
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    key = (lo << 32) | hi
    key = np.unique(key)[: m]
    return (key >> 32), (key & 0xFFFFFFFF)


def run_block(variant, small_tot, n, bs, bd, d_len, d_start, od_):
    mb = len(bs)
    run_start = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    run_end = np.r_[run_start[1:], mb]
    run_tot = np.add.reduceat(d_len, run_start) if mb else np.empty(0, np.int64)
    total = 0
    iters = 0
    big = run_tot >= small_tot
    mask = np.zeros(n, dtype=bool)
    for lo, hi in zip(run_start[big], run_end[big]):
        iters += 1
        lens = d_len[lo:hi]
        tot = int(lens.sum())
        if tot == 0:
            continue
        rc = bd[lo:hi]
        mask[rc] = True
        starts = d_start[lo:hi]
        offs = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
            + np.repeat(starts, lens)
        )
        total += int(np.count_nonzero(mask[od_[offs]]))
        mask[rc] = False
    # small runs: grouped sort-probe passes
    CHUNK = 1 << 24
    small_idx = np.flatnonzero(~big)
    run_id = np.cumsum(np.r_[0, (bs[1:] != bs[:-1]).astype(np.int64)]) if mb else None
    g0 = 0
    cum_small = np.cumsum(run_tot[small_idx])
    while g0 < len(small_idx):
        iters += 1
        base = cum_small[g0 - 1] if g0 else 0
        g1 = min(max(int(np.searchsorted(cum_small, base + CHUNK)) + 1, g0 + 1),
                 len(small_idx))
        runs = small_idx[g0:g1]
        counts = run_end[runs] - run_start[runs]
        tot_edges = int(counts.sum())
        if tot_edges:
            eidx = (
                np.arange(tot_edges, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts)
                + np.repeat(run_start[runs], counts)
            )
            lens = d_len[eidx]
            tot = int(lens.sum())
            if tot:
                offs = (
                    np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(lens) - lens, lens)
                    + np.repeat(d_start[eidx], lens)
                )
                keys_a = (run_id[eidx] << 32) | bd[eidx]
                bkeys = np.repeat(run_id[eidx] << 32, lens) | od_[offs]
                bkeys.sort()
                lo_i = np.searchsorted(bkeys, keys_a, side="left")
                hi_i = np.searchsorted(bkeys, keys_a, side="right")
                total += int((hi_i - lo_i).sum())
        g0 = g1
    return total, iters


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    t0 = time.time()
    s, d = rmat(scale)
    m = len(s)
    print(f"graph: m={m} gen={time.time()-t0:.1f}s")
    n = int(max(s.max(), d.max())) + 1
    deg = np.bincount(s, minlength=n) + np.bincount(d, minlength=n)
    fwd = (deg[s] < deg[d]) | ((deg[s] == deg[d]) & (s < d))
    os_ = np.where(fwd, s, d)
    od_all = np.where(fwd, d, s)
    order = np.argsort((os_ << 32) | od_all)
    os_, od_all = os_[order], od_all[order]
    rowptr = np.zeros(n + 1, dtype=np.int64)
    rowptr[1:] = np.cumsum(np.bincount(os_, minlength=n))

    blocks = []
    for blk in range(2):
        sel = (os_ % n_blocks) == blk
        bs, bd = os_[sel], od_all[sel]
        uniq_d = np.unique(bd)
        pos = np.searchsorted(uniq_d, bd)
        d_len = (rowptr[uniq_d + 1] - rowptr[uniq_d])[pos]
        d_start = rowptr[uniq_d][pos]
        blocks.append((bs, bd, d_len, d_start))

    results = {}
    for small_tot in (0, 64, 256, 1024, 2048, 1 << 62):
        t0 = time.time()
        total, iters = 0, 0
        for bs, bd, d_len, d_start in blocks:
            t, i = run_block("hybrid", small_tot, n, bs, bd, d_len, d_start, od_all)
            total += t
            iters += i
        dt = time.time() - t0
        results[small_tot] = (dt, total)
        name = {0: "pure-maskloop", 1 << 62: "pure-sortprobe"}.get(
            small_tot, f"hybrid T={small_tot}"
        )
        print(f"{name}: {dt:.2f}s count={total} loop_iters={iters}")
    assert len({v[1] for v in results.values()}) == 1, results


if __name__ == "__main__":
    main()
