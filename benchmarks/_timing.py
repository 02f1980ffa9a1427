"""Shared relay-honest timing for the benchmark probes.

One implementation of the repo's measurement convention (CLAUDE.md): each
quantity is the DELTA between a 1-repeat and an R-repeat on-device
`lax.scan` chain with per-iteration RNG and a scalar fetch — fixed relay
latency and dispatch cost cancel. When several programs are compared, one
delta per program is taken per ROUND (interleaved), so one-sided relay
drift hits every program equally instead of biasing whichever ran last.
Reduction is the MEDIAN over rounds; non-positive deltas (a slow relay
round on the short chain) are discarded as invalid rather than reported.
"""

import itertools
import time


def seed_counter():
    """Globally unique measurement seeds (unique across processes too), so
    the relay's duplicate-execution cache can never short-circuit a repeat."""
    return itertools.count((int(time.time()) % 1_000_000) * 1_000)


def interleaved_deltas(chains, chain_len, trials, seeds):
    """Per-repeat seconds for each program in ``chains``.

    ``chains``: mapping label -> (f1, fR) where f1 runs the 1-repeat chain
    and fR the (1+chain_len)-repeat chain; both take a seed. Returns
    label -> sorted list of valid per-repeat deltas (may be shorter than
    ``trials`` if some rounds were drowned by relay jitter).
    """
    out = {label: [] for label in chains}
    for _ in range(trials):
        for label, (f1, fR) in chains.items():
            t0 = time.perf_counter()
            f1(next(seeds))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            fR(next(seeds))
            tr = time.perf_counter() - t0
            d = (tr - t1) / chain_len
            if d > 0:
                out[label].append(d)
    for label in out:
        out[label].sort()
    return out


def median(xs):
    assert xs, "no valid timing rounds survived (relay jitter?)"
    n = len(xs)
    s = sorted(xs)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])
