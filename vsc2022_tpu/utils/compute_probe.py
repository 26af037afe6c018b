"""Relay-variance-cancelled device-compute probes.

This rig reaches the TPU through a loopback relay whose per-dispatch
RPC cost swings ~2x across processes, so raw wall-time benchmarks of
dispatch-bound paths track the link more than the code (bench r02 433
→ r03 287 qvideos/s on nothing but relay speed). The fix, proven for
retrieval in round 4: run the measured device program N times INSIDE
ONE EXECUTABLE (a lax.scan whose carry depends on each iteration's
output, so XLA cannot hoist or CSE the body) and difference against
the 1-repetition executable. The dispatch RPC and the D2H pull appear
once in both and cancel; what remains is pure device compute — a
number that CANNOT swing on relay jitter round-over-round.

Probes here cover the two serving-path device programs (the fused
score-normalized candidate dispatch and the TN alignment batch) so
bench.py can report ``serving_warm_compute_s`` alongside the
dispatch-bound wall numbers. The TN DP is shape-bound (a fixed-length
scan with no data-dependent control flow), so probing it on synthetic
similarity matrices of the production geometry measures the true
per-batch compute.

No reference analog: the reference benchmarks nothing (SURVEY.md §6)
and its FAISS/VCSL stages run in-process, where wall time IS compute
time.
"""

from __future__ import annotations

import functools
import time

import numpy as np


def differenced_seconds(run, reps: int = 4, samples: int = 3) -> float:
    """Differenced timing of ``run(n_rep) -> device array``: best-of-
    ``samples`` wall time at ``reps`` repetitions minus at 1, divided
    by (reps - 1). ``run`` must force completion when its result is
    fetched with np.asarray (block_until_ready does not block through
    this rig's relay)."""

    def t(n_rep: int) -> float:
        np.asarray(run(n_rep))  # warm/compile
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(run(n_rep))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(reps) - t(1)) / (reps - 1), 0.0)


def sn_search_compute_probe(
    sn_searcher, queries, nq: int, k: int, reps: int = 4, samples: int = 3
) -> float:
    """Device compute per fused score-normalized search (bias +
    candidates + τ + counts — the dominant dispatch of a search or
    serving request; the small repair/host-unpack tail is excluded).
    ``sn_searcher`` is a retrieval.sn_search.ScoreNormalizedSearcher
    over an UNSHARDED corpus; ``queries`` the raw [nq_frames, D] query
    matrix; ``k`` the global-k budget the production search would use.
    """
    import jax
    import jax.numpy as jnp

    from vsc2022_tpu.ops.similarity import (
        SimilaritySearcher,
        _fused_sn_candidates_packed,
    )

    s = sn_searcher.searcher
    ns = sn_searcher.noise_searcher
    if type(s) is not SimilaritySearcher:
        raise ValueError("compute probe supports unsharded corpora only")
    kappa_eff, k_eff = s._plan(nq, k, None)
    rb = s._plan_row_block(nq)
    q_dev = ns._stage_queries(queries, rb)
    jax.block_until_ready(q_dev)
    mode = s._collection_mode(q_dev.shape[0], kappa_eff, True)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(q_staged, n_rep):
        def body(carry, _):
            packed, _, _, _ = _fused_sn_candidates_packed(
                q_staged.at[0, 0].add(carry),
                ns._refs, ns._n_valid, ns._ref_sq,
                s._refs, s._n_valid, s._ref_sq,
                jnp.asarray(nq, jnp.int32),
                jnp.asarray(k_eff, jnp.int32),
                beta=float(sn_searcher.beta), kappa=kappa_eff,
                noise_col_block=ns.col_block, col_block=s.col_block,
                precision=s.precision, approx=mode, row_block=rb,
                metric=s._kernel_metric,
            )
            # Denormal-scale carry: numerically inert, but a real data
            # dependence from each output to the next input.
            nxt = (packed.ravel()[0].astype(jnp.float32) % 2.0) * 1e-38
            return nxt, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_rep)
        return c

    return differenced_seconds(
        lambda n: run(q_dev, n), reps=reps, samples=samples
    )


def tn_align_compute_probe(
    b: int, nq: int, nr: int, params=None, reps: int = 4, samples: int = 3
) -> float:
    """Device compute per TN alignment batch of geometry [b, nq, nr].
    The DP is a fixed-length scan (no data-dependent control flow), so
    synthetic similarity matrices at the production geometry measure
    the true per-batch compute."""
    import jax
    import jax.numpy as jnp

    from vsc2022_tpu.ops.tn_align import TNParams, tn_align_packed

    params = params or TNParams()
    key = jax.random.PRNGKey(0)
    sims = jax.random.uniform(key, (b, nq, nr), jnp.float32)
    lens_q = jnp.full((b,), nq, jnp.int32)
    lens_r = jnp.full((b,), nr, jnp.int32)
    jax.block_until_ready(sims)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(sims_in, n_rep):
        def body(carry, _):
            packed = tn_align_packed(
                sims_in.at[0, 0, 0].add(carry), lens_q, lens_r, params
            )
            nxt = (packed.ravel()[0] % 2.0) * 1e-38
            return nxt, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_rep)
        return c

    return differenced_seconds(
        lambda n: run(sims, n), reps=reps, samples=samples
    )
