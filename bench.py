#!/usr/bin/env python3
"""End-to-end benchmark: TPU retrieval + SSCD descriptor inference.

Four measured workloads plus a resident-serving workload, fixed seeds
and sizes across rounds so the driver can track regressions:

1. Retrieval (the reference's CPU-FAISS role; BASELINE.md north star is
   >10x query-videos/sec): score-normalized retrieval exactly as the
   SSCD pipeline runs it — noise-NN score normalization (k=1 over the
   noise corpus) + global top-k frame search (k = 1200*|Q|) + per-pair
   max aggregation. Baseline is a numpy brute-force pipeline on the host
   CPU (faiss is not installed here; BLAS-backed CPU FAISS IndexFlatIP
   would land several x faster than this loop, so read vs_baseline as an
   upper bound on the margin vs CPU FAISS).
2. Inference (the reference's heavy job — per-frame SSCD descriptor
   extraction; vsc/baseline/inference_impl.py:210-239): batched
   ResNet-50+GeM forward at 320x320 on the TPU, fps measured both
   end-to-end from host uint8 frames and device-resident (the split
   exposes the host link cost: this rig reaches the chip over a
   ~25-30 MB/s relay).
3. Localization (TN alignment batches) and 4. DnS two-stage
   localization (fused chamfer+coarse sims + TN).

Metric-reading guide: the primary `value` stays the e2e
`retrieval_qps` for round-over-round CONTINUITY, but it is
relay-bound — BENCH_r01-r03 swung 68 → 202 → 162 tracking the link,
not the code. Round-over-round REGRESSION judgments should key on the
in-dispatch repetition-differenced metrics, which cannot swing on
relay jitter: `retrieval_qps_compute` / `retrieval_device_compute_s`
(retrieval) and `serving_warm_compute_s` (serving).

Structural no-lost-rounds contract (round-5 redesign; a round-4 child
timeout recorded NOTHING):
- PREFLIGHT: a ~90 s hard-timeout probe child checks the TPU relay
  first; an outage prints the explicit outage JSON within ~2 minutes
  instead of after the full measurement budget.
- INCREMENTAL FLUSH: the measurement child atomically rewrites a
  scratch JSON after every metric it lands; if the child times out or
  dies, the parent prints whatever the scratch holds plus an
  `incomplete` list — a slow relay costs arms, not the round.
- BUDGET: one child attempt inside a fixed budget (no blind retry);
  the child skips remaining workloads (and demotes the historical
  b128/b256 inference arms) when the budget runs low. The serving
  child gets TWO attempts (like the preflight): the relay occasionally
  stalls a fresh process's backend init at ~0% CPU — observed live,
  the same serving child ran 128 s in one process and hung >400 s in
  the next — and the playbook is kill + lease backoff + one retry.
  Worst-case wall ~= preflight 225 s + child 660 s + serving 645 s
  ~= 25 min; typical warm wall is ~11 min.

Prints ONE JSON line; primary metric stays query_videos_per_sec with
vs_baseline = TPU qps / numpy-CPU qps.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

# Retrieval workload scale: ~60-frame videos, SSCD-like 512-d descriptors.
# (Fixed across rounds — the driver tracks this number over time.)
N_QUERY_VIDEOS = 150
N_REF_VIDEOS = 1000
N_NOISE_FRAMES = 30_000
FRAMES = 60
DIM = 512
GLOBAL_K = 1200 * N_QUERY_VIDEOS

# Inference workload: SSCD forward, reference-default input size.
INF_BATCH = 32
INF_HW = 320
INF_BATCHES = 4

# Time budgets (seconds). The parent's child timeout adds a 60 s kill
# grace on top of CHILD_BUDGET; the child stops starting new work at
# ~90% of its budget so completed arms flush before the kill.
PREFLIGHT_BUDGET = int(os.environ.get("VSC2022_TPU_BENCH_PREFLIGHT", "90"))
# Wait between the two preflight attempts: the relay holds the chip
# lease briefly after a SIGKILLed client, and the next init hangs.
PREFLIGHT_BACKOFF = int(
    os.environ.get("VSC2022_TPU_BENCH_PREFLIGHT_BACKOFF", "45")
)
CHILD_BUDGET = int(os.environ.get("VSC2022_TPU_BENCH_BUDGET", "600"))
SERVE_BUDGET = int(os.environ.get("VSC2022_TPU_BENCH_SERVE_BUDGET", "300"))
KILL_GRACE = int(os.environ.get("VSC2022_TPU_BENCH_GRACE", "60"))

WORKLOADS = ("retrieval", "inference", "localization", "dns_localization")

# Test/smoke hook: shrink every workload to seconds-on-CPU scale. The
# emitted KEYS are unchanged but the numbers are meaningless — never
# set for a driver run (tests/test_bench_contract.py uses it to pin
# the partial-flush contract without a TPU).
_TINY = os.environ.get("VSC2022_TPU_BENCH_TINY") == "1"
if _TINY:
    N_QUERY_VIDEOS, N_REF_VIDEOS, N_NOISE_FRAMES, FRAMES = 6, 40, 2000, 10
    GLOBAL_K = 1200 * N_QUERY_VIDEOS
    INF_BATCH, INF_HW, INF_BATCHES = 4, 64, 2

_DEADLINE = None  # monotonic seconds; set by the measurement child


def _budget_left() -> float:
    if _DEADLINE is None:
        return float("inf")
    return _DEADLINE - time.monotonic()


class _FlushingResults(dict):
    """Results dict that atomically rewrites a scratch JSON on every
    key set, so a killed child still leaves everything it measured."""

    def __init__(self, scratch_path=None):
        super().__init__()
        self._scratch = scratch_path

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.flush()

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        self.flush()

    def flush(self):
        if not self._scratch:
            return
        tmp = self._scratch + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(self), f)
        os.replace(tmp, self._scratch)


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_data(rng):
    q = l2n(rng.standard_normal((N_QUERY_VIDEOS * FRAMES, DIM), dtype=np.float32))
    r = l2n(rng.standard_normal((N_REF_VIDEOS * FRAMES, DIM), dtype=np.float32))
    noise = l2n(rng.standard_normal((N_NOISE_FRAMES, DIM), dtype=np.float32))
    # Plant copies so the score distribution has realistic structure.
    for i in range(0, N_QUERY_VIDEOS, 4):
        if _TINY:
            q[i * FRAMES + 2 : i * FRAMES + 8] = r[i * FRAMES : i * FRAMES + 6]
        else:
            q[i * FRAMES + 10 : i * FRAMES + 30] = r[i * FRAMES + 5 : i * FRAMES + 25]
    return q, r, noise


def tpu_build(r, noise):
    """One-time index staging (the FAISS index-build analog)."""
    from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

    return ScoreNormalizedSearcher(r, noise, beta=1.2, precision="default")


def cpu_pipeline(q, r, noise):
    """Identical computation, numpy on host CPU."""
    bias = np.empty(q.shape[0], dtype=np.float32)
    for start in range(0, q.shape[0], 1024):
        block = q[start : start + 1024]
        bias[start : start + 1024] = -1.2 * (block @ noise.T).max(axis=1)
    q_sn = np.concatenate([q, bias[:, None]], axis=1)
    r_sn = np.concatenate([r, np.ones((r.shape[0], 1), np.float32)], axis=1)

    k = GLOBAL_K
    # Row-blocked scoring with a global running top-k.
    top_s = np.empty(0, dtype=np.float32)
    top_q = np.empty(0, dtype=np.int64)
    top_r = np.empty(0, dtype=np.int64)
    for start in range(0, q_sn.shape[0], 1024):
        scores = q_sn[start : start + 1024] @ r_sn.T
        flat = scores.ravel()
        take = min(k, flat.size)
        part = np.argpartition(flat, flat.size - take)[-take:]
        qi, ri = np.unravel_index(part, scores.shape)
        top_s = np.concatenate([top_s, flat[part]])
        top_q = np.concatenate([top_q, qi + start])
        top_r = np.concatenate([top_r, ri])
        if top_s.size > k:
            sel = np.argpartition(top_s, top_s.size - k)[-k:]
            top_s, top_q, top_r = top_s[sel], top_q[sel], top_r[sel]
    order = np.lexsort((top_r, top_q, -top_s))
    return top_q[order], top_r[order], top_s[order]


def _rpc_floor_ms(n=10):
    """Per-dispatch RPC round-trip floor on this rig's relay (a tiny
    jitted op, best-of-n). Recorded every round so relay-speed swings
    in the raw wall-time metrics are attributable: when rpc_floor_ms
    doubles round-over-round, so do all dispatch-bound numbers."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.float32(0.0))
    np.asarray(f(x))  # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _host_global_select(dense, k):
    """Host global-top-k selection over a dense [nq, nr] score matrix
    with the searcher's documented tie-break: score desc, then (q, r)
    asc."""
    nq, nr = dense.shape
    flat = dense.ravel()
    k = min(k, flat.size)
    qid = np.repeat(np.arange(nq, dtype=np.int64), nr)
    rid = np.tile(np.arange(nr, dtype=np.int64), nq)
    order = np.lexsort((rid, qid, -flat))[:k]
    return qid[order], rid[order], flat[order]


def _selection_exactness_gate(sn, q_small, k, label):
    """The storage tier's contract, asserted EXACTLY (replaces the old
    fuzzy top-1000 agreement gate, which would have passed a subtly
    mis-scaled dequantize path): global_topk must equal a host
    selection oracle — incl. the score-desc/(q,r)-asc tie-break — over
    the DEVICE-computed dense scores of the same staged corpus. The
    dense scores come from the searcher's own row_topk at k=n_refs on
    the same bias-augmented queries the search used (last_q_sn), so
    the oracle scores the identical dequantized/bf16 corpus through
    the identical per-block kernel; cross-dispatch score determinism
    is the same property the production count-verify repair already
    relies on. Returns the device result for further value checks."""
    qi, ri, sc = sn.global_topk(q_small, k)
    s = sn.searcher
    nq = q_small.shape[0]
    dense_s, dense_i = s.row_topk(sn.last_q_sn[:nq], s.n_refs)
    dense = np.full((nq, s.n_refs), -np.inf, dtype=np.float32)
    rows = np.repeat(np.arange(nq), dense_i.shape[1])
    dense[rows, dense_i.ravel()] = dense_s.ravel()
    oqi, ori, osc = _host_global_select(dense, k)
    np.testing.assert_array_equal(qi, oqi, err_msg=f"{label}: query ids")
    np.testing.assert_array_equal(ri, ori, err_msg=f"{label}: ref ids")
    np.testing.assert_array_equal(
        np.asarray(sc, dtype=np.float32), osc, err_msg=f"{label}: scores"
    )
    return qi, ri, sc


def _int8_dequantize_value_gate(q_small, r, noise, beta, qi, ri, sc):
    """Second half of the int8 exactness contract: the device scores
    must MATCH a host float64 oracle over the host-dequantized corpus
    (scale * int8 row) within matmul-precision tolerance — this is
    what catches a mis-scaled dequantize path (the selection gate
    alone would confirm a consistently-wrong scoring). Tolerance
    covers the device's reduced-precision f32 matmul; a scale bug is
    orders of magnitude outside it."""
    from vsc2022_tpu.ops.similarity import quantize_rows_int8

    r_sn = np.concatenate(
        [r, np.ones((r.shape[0], 1), np.float32)], axis=1
    )
    r_q, r_scale = quantize_rows_int8(r_sn)
    n_q, n_scale = quantize_rows_int8(
        np.ascontiguousarray(noise, dtype=np.float32)
    )
    q64 = q_small.astype(np.float64)
    noise_deq = n_q.astype(np.float64) * n_scale[:, None].astype(np.float64)
    bias = -beta * (q64 @ noise_deq.T).max(axis=1)
    q_sn = np.concatenate([q64, bias[:, None]], axis=1)
    r_deq = r_q.astype(np.float64) * r_scale[:, None].astype(np.float64)
    expect = np.einsum("ij,ij->i", q_sn[qi], r_deq[ri])
    np.testing.assert_allclose(
        np.asarray(sc, dtype=np.float64), expect, rtol=2e-2, atol=1e-3,
        err_msg="int8 device scores disagree with the host "
                "dequantized-corpus oracle (mis-scaled dequantize?)",
    )


def bench_retrieval(results):
    import jax

    from vsc2022_tpu.utils.compute_probe import sn_search_compute_probe

    rng = np.random.default_rng(0)
    q, r, noise = make_data(rng)

    searcher = tpu_build(r, noise)
    searcher.global_topk(q, GLOBAL_K)  # warmup/compile

    # End-to-end (host numpy in, host arrays out); best-of-5 to shed
    # relay jitter.
    e2e_s = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        qi, ri, scores = searcher.global_topk(q, GLOBAL_K)
        e2e_s = min(e2e_s, time.perf_counter() - t0)

    # Device-resident: queries pre-staged in HBM, so the measured time
    # is compute + the (small) top-k result D2H. link_s = e2e - compute.
    q_dev = jax.device_put(q)
    jax.block_until_ready(q_dev)
    searcher.global_topk(q_dev, GLOBAL_K)  # warm any shape-specialized jit
    compute_s = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        searcher.global_topk(q_dev, GLOBAL_K)
        compute_s = min(compute_s, time.perf_counter() - t0)
    link_s = max(e2e_s - compute_s, 0.0)

    # Achieved FLOP/s over the two matmuls (top-k selection excluded).
    flops = 2.0 * q.shape[0] * noise.shape[0] * DIM  # noise-NN pass
    flops += 2.0 * q.shape[0] * r.shape[0] * (DIM + 1)  # main search
    tflops = flops / compute_s / 1e12

    # In-dispatch differenced device compute (relay-independent): the
    # round-over-round regression tracker. The raw *_device numbers
    # below still carry per-dispatch RPC jitter (r02 433 → r03 287
    # qvideos/s on nothing but relay speed); this one cannot.
    probe_s = sn_search_compute_probe(searcher, q, q.shape[0], GLOBAL_K)
    results["retrieval_device_compute_s"] = round(probe_s, 4)
    results["retrieval_qps_compute"] = round(
        N_QUERY_VIDEOS / probe_s, 2
    ) if probe_s > 0 else 0.0
    results["rpc_floor_ms"] = round(_rpc_floor_ms(), 1)
    results["retrieval_qps"] = round(N_QUERY_VIDEOS / e2e_s, 2)
    # Device-resident rate: excludes the query H2D, so it tracks the
    # search itself rather than this rig's variable relay link speed.
    results["retrieval_qps_device"] = round(N_QUERY_VIDEOS / compute_s, 2)
    results["retrieval_tflops"] = round(tflops, 3)
    results["link_s"] = round(link_s, 3)
    results["compute_s"] = round(compute_s, 3)

    # bf16 variant: corpus + queries staged/computed in bfloat16 (halves
    # HBM footprint and H2D transfer, MXU-native matmul). Result set
    # agreement with f32 is ~1.0 on this workload; scores quantize to
    # bf16 resolution. Same best-of-5 sampling as the f32 run (the
    # round-2 bf16 number regressed on asymmetric best-of-3 sampling
    # under relay jitter).
    from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

    bf16_searcher = ScoreNormalizedSearcher(
        r, noise, beta=1.2, precision="default", dtype="bfloat16"
    )
    bf16_searcher.global_topk(q, GLOBAL_K)  # warmup
    bf16_e2e = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        bqi, bri, _ = bf16_searcher.global_topk(q, GLOBAL_K)
        bf16_e2e = min(bf16_e2e, time.perf_counter() - t0)
    bf16_agree = len(
        set(zip(qi[:1000].tolist(), ri[:1000].tolist()))
        & set(zip(bqi[:1000].tolist(), bri[:1000].tolist()))
    ) / 1000.0
    assert bf16_agree > 0.98, f"bf16/f32 search disagree: {bf16_agree:.3f}"

    # Link-independent bf16 rate: queries pre-staged (the e2e number
    # folds in this rig's variable relay link).
    bf16_searcher.global_topk(q_dev, GLOBAL_K)  # warm the device path
    bf16_dev = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        bf16_searcher.global_topk(q_dev, GLOBAL_K)
        bf16_dev = min(bf16_dev, time.perf_counter() - t0)
    results["retrieval_qps_bf16"] = round(N_QUERY_VIDEOS / bf16_e2e, 2)
    results["retrieval_qps_device_bf16"] = round(N_QUERY_VIDEOS / bf16_dev, 2)

    # bf16 exactness gate: selection must be exact over the
    # bf16-staged corpus incl. tie-breaks (64-row subsample).
    n_gate = min(64, q.shape[0])
    _selection_exactness_gate(
        bf16_searcher, q[:n_gate], min(1024, GLOBAL_K), "bf16"
    )

    # int8 (SQ8) capacity tier: symmetric per-row int8 corpus (4x f32
    # rows per chip), search exact over the dequantized rows incl.
    # tie-breaks. At this 61k workload the device rate mostly tracks
    # dispatch — the tier's wins (capacity, 6x staging, 1M-scale e2e)
    # live in docs/performance.md — but recording the device arm here
    # keeps the tier on the round-over-round scoreboard. Device arm
    # only (queries pre-staged): the e2e number would just re-measure
    # the relay.
    int8_searcher = ScoreNormalizedSearcher(
        r, noise, beta=1.2, precision="default", dtype="int8"
    )
    int8_searcher.global_topk(q_dev, GLOBAL_K)  # warmup/compile
    int8_dev = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int8_searcher.global_topk(q_dev, GLOBAL_K)
        int8_dev = min(int8_dev, time.perf_counter() - t0)
    results["retrieval_qps_device_int8"] = round(N_QUERY_VIDEOS / int8_dev, 2)

    # int8 exactness gates (both halves of the tier's contract):
    # selection exact over the dequantized corpus incl. tie-breaks,
    # and device scores matching a host f64 dequantized oracle.
    iqi, iri, isc = _selection_exactness_gate(
        int8_searcher, q[:n_gate], min(1024, GLOBAL_K), "int8"
    )
    _int8_dequantize_value_gate(
        q[:n_gate], r, noise, int8_searcher.beta, iqi, iri, isc
    )

    cpu_time = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        cqi, cri, cscores = cpu_pipeline(q, r, noise)
        cpu_time = min(cpu_time, time.perf_counter() - t0)

    # Sanity: both paths must retrieve (near-)identical result sets.
    agreement = len(
        set(zip(qi[:1000].tolist(), ri[:1000].tolist()))
        & set(zip(cqi[:1000].tolist(), cri[:1000].tolist()))
    ) / 1000.0
    assert agreement > 0.99, f"TPU/CPU search disagree: {agreement:.3f}"

    results["vs_baseline"] = round(
        (N_QUERY_VIDEOS / e2e_s) / (N_QUERY_VIDEOS / cpu_time), 2
    )


def bench_inference(results):
    """SSCD forward fps: uint8 frames -> on-device preprocess -> ResNet-50
    +GeM descriptors (the reference's per-frame extraction hot loop)."""
    import jax
    import jax.numpy as jnp

    from vsc2022_tpu.inference.transforms import (
        InferenceTransforms,
        preprocess,
    )
    from vsc2022_tpu.models import SSCDModel

    model = SSCDModel()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, INF_HW, INF_HW, 3), jnp.float32),
    )

    @jax.jit
    def embed(vars_, frames_u8):
        images = preprocess(frames_u8, InferenceTransforms.RESIZE_320_CENTER)
        return model.apply(vars_, images)

    rng = np.random.default_rng(1)
    frames = rng.integers(
        0, 256, size=(INF_BATCH, INF_HW, INF_HW, 3), dtype=np.uint8
    )
    np.asarray(embed(variables, frames))  # warmup/compile

    # End-to-end: host uint8 -> H2D -> preprocess+forward -> D2H.
    e2e_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed(variables, frames))
        e2e_s = min(e2e_s, time.perf_counter() - t0)
    results["inference_fps"] = round(INF_BATCH / e2e_s, 2)

    # Device-resident: frames already in HBM; the np.asarray pull of the
    # [32, 512] output (65 KB) is the sync point — block_until_ready
    # does NOT block through this rig's relay, so completion must be
    # forced by a D2H fetch.
    frames_dev = jax.device_put(frames)
    np.asarray(embed(variables, frames_dev))
    dev_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed(variables, frames_dev))
        dev_s = min(dev_s, time.perf_counter() - t0)
    results["inference_fps_device"] = round(INF_BATCH / dev_s, 2)

    # bf16 variant: parameters + activations cast, MXU-native convs.
    vars_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        variables,
    )

    @jax.jit
    def embed_bf16(vars_, frames_u8):
        images = preprocess(frames_u8, InferenceTransforms.RESIZE_320_CENTER)
        return model.apply(vars_, images.astype(jnp.bfloat16)).astype(
            jnp.float32
        )

    np.asarray(embed_bf16(vars_bf16, frames_dev))  # warmup/compile
    bf16_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed_bf16(vars_bf16, frames_dev))
        bf16_s = min(bf16_s, time.perf_counter() - t0)
    results["inference_fps_device_bf16"] = round(INF_BATCH / bf16_s, 2)

    # Per-frame FLOPs from the compiled executable when XLA reports it;
    # else the analytic ResNet-50 estimate (~4.1 GMACs @224^2, scaled).
    try:
        cost = embed.lower(variables, frames_dev).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        gflop_per_frame = cost["flops"] / INF_BATCH / 1e9
    except Exception:
        gflop_per_frame = 2 * 4.1 * (INF_HW / 224.0) ** 2
    results["inference_tflops"] = round(
        gflop_per_frame * (INF_BATCH / dev_s) / 1e3, 3
    )
    results["inference_gflop_per_frame"] = round(gflop_per_frame, 2)

    # Best-throughput configuration: bf16 + batch 512 + BN folded into
    # conv weights (the b512 probe measured +11% over b256; the BN
    # elementwise passes cost another ~6-8% and preprocess ~0 —
    # tools/profile_inference.py; fold math in models/fold.py).
    from vsc2022_tpu.models import fold_batchnorm

    b512 = 32 if _TINY else 512
    b1024 = 64 if _TINY else 1024
    model_folded = SSCDModel(fold_bn=True)
    # fold_batchnorm returns host numpy: device_put ONCE, or every call
    # re-ships ~25 MB of weights through the relay (measured 8x fps).
    vars_folded = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        fold_batchnorm(variables),
    ))

    @jax.jit
    def embed_folded(vars_, frames_u8):
        images = preprocess(frames_u8, InferenceTransforms.RESIZE_320_CENTER)
        return model_folded.apply(vars_, images.astype(jnp.bfloat16)).astype(
            jnp.float32
        )

    frames_512 = jax.device_put(
        rng.integers(0, 256, size=(b512, INF_HW, INF_HW, 3), dtype=np.uint8)
    )
    np.asarray(embed_folded(vars_folded, frames_512))
    b512_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed_folded(vars_folded, frames_512))
        b512_s = min(b512_s, time.perf_counter() - t0)
    results["inference_fps_device_b512_bf16"] = round(b512 / b512_s, 2)

    # b1024 (round 4): +17% over b512 in the fused preprocess+forward
    # path (4007 vs 3432 fps measured; the frames arrive u8, so the
    # staged batch fits where a separately-staged bf16 image buffer
    # would not).
    frames_1024 = jax.device_put(
        rng.integers(0, 256, size=(b1024, INF_HW, INF_HW, 3), dtype=np.uint8)
    )
    np.asarray(embed_folded(vars_folded, frames_1024))
    b1024_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed_folded(vars_folded, frames_1024))
        b1024_s = min(b1024_s, time.perf_counter() - t0)
    results["inference_fps_device_b1024_bf16"] = round(b1024 / b1024_s, 2)

    # Steady-state throughput, the production extractor's dispatch
    # pattern: inference/pipeline.py issues batch n+1 before pulling
    # batch n's descriptors (lag-1), so the per-batch RPC floor and
    # the D2H pull overlap device compute instead of serializing with
    # it. Dispatch all batches async, then drain the pulls.
    n_pipe = 6
    np.asarray(embed_folded(vars_folded, frames_512))
    pipe_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [
            embed_folded(vars_folded, frames_512) for _ in range(n_pipe)
        ]
        for o in outs:
            np.asarray(o)
        pipe_s = min(pipe_s, (time.perf_counter() - t0) / n_pipe)
    results["inference_fps_device_b512_bf16_pipelined"] = round(
        b512 / pipe_s, 2
    )

    # Steady state at the b1024 best batch (round 4: +17% over b512
    # unpipelined) — the production extractor's throughput ceiling.
    np.asarray(embed_folded(vars_folded, frames_1024))
    pipe1024_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [
            embed_folded(vars_folded, frames_1024) for _ in range(n_pipe)
        ]
        for o in outs:
            np.asarray(o)
        pipe1024_s = min(pipe1024_s, (time.perf_counter() - t0) / n_pipe)
    results["inference_fps_device_b1024_bf16_pipelined"] = round(
        b1024 / pipe1024_s, 2
    )
    del frames_1024

    # Historical continuity arms (b128 unfused-f32, b256 bf16): the
    # least-informative points — demoted to run only when the budget
    # allows (they compile two more executables through the relay).
    if _budget_left() < 120:
        print("budget: skipping b128/b256 historical arms", file=sys.stderr)
        return
    big = 8 if _TINY else 128
    frames_big = jax.device_put(
        rng.integers(0, 256, size=(big, INF_HW, INF_HW, 3), dtype=np.uint8)
    )
    np.asarray(embed(variables, frames_big))
    big_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed(variables, frames_big))
        big_s = min(big_s, time.perf_counter() - t0)
    results["inference_fps_device_b128"] = round(big / big_s, 2)

    b256 = 16 if _TINY else 256
    frames_256 = jax.device_put(
        rng.integers(0, 256, size=(b256, INF_HW, INF_HW, 3), dtype=np.uint8)
    )
    np.asarray(embed_bf16(vars_bf16, frames_256))
    b256_s = float("inf")
    for _ in range(INF_BATCHES):
        t0 = time.perf_counter()
        np.asarray(embed_bf16(vars_bf16, frames_256))
        b256_s = min(b256_s, time.perf_counter() - t0)
    results["inference_fps_device_b256_bf16"] = round(b256 / b256_s, 2)


def bench_localization(results):
    """TN alignment throughput: candidate pairs aligned per second
    (the reference runs VCSL TN on a 16-process CPU pool —
    vsc/baseline/sscd_baseline.py:118-126)."""
    import jax

    from vsc2022_tpu.ops.tn_align import TNParams, tn_align

    rng = np.random.RandomState(7)
    b, nq, nr = (8, 32, 32) if _TINY else (64, 128, 128)
    sims = (0.1 * rng.rand(b, nq, nr)).astype(np.float32)
    for i in range(b):  # plant a diagonal per pair
        lim = max(nq - 35, 2)
        q0, r0 = rng.randint(0, lim, 2)
        for t in range(min(30, nq - max(q0, r0) - 1)):
            sims[i, q0 + t, r0 + t] = 0.9
    lens = jax.device_put(np.full(b, min(100, nq), np.int32))
    sims_dev = jax.device_put(sims)
    params = TNParams()

    np.asarray(tn_align(sims_dev, lens, lens, params)[0])  # warmup
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(tn_align(sims_dev, lens, lens, params)[0])
        best = min(best, time.perf_counter() - t0)
    results["localization_pairs_per_sec"] = round(b / best, 1)

    # Production batch: per-dispatch overhead amortizes ~5x (the batch
    # the localizer actually forms under its HBM element budget).
    big_b = 16 if _TINY else 1024
    sims_big = np.tile(sims, (big_b // b, 1, 1, 1)).reshape(big_b, nq, nr)
    lens_big = jax.device_put(np.full(big_b, min(100, nq), np.int32))
    sims_big_dev = jax.device_put(sims_big)
    np.asarray(tn_align(sims_big_dev, lens_big, lens_big, params)[0])
    best_big = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(tn_align(sims_big_dev, lens_big, lens_big, params)[0])
        best_big = min(best_big, time.perf_counter() - t0)
    results["localization_pairs_per_sec_b1024"] = round(big_b / best_big, 1)


def bench_dns_localization(results):
    """DnS two-stage localization throughput: fused fine(9-region
    chamfer)+coarse similarity + TN alignment, from device-resident
    feature tables (the reference runs TorchScript per pair on a CPU
    pool; vsc/baseline/dns_baseline.py:138-163)."""
    from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
    from vsc2022_tpu.metrics import CandidatePair
    from vsc2022_tpu.types import VideoFeature

    rng = np.random.default_rng(3)
    if _TINY:
        n_videos, frames, regions, d_f, d_c = 8, 12, 9, 64, 128
        n_pairs = 16
    else:
        n_videos, frames, regions, d_f, d_c = 96, 60, 9, 512, 1024
        n_pairs = 512

    def make(prefix, n):
        out_fine, out_coarse = {}, []
        ts = np.stack(
            [np.arange(frames, dtype=np.float64),
             np.arange(1, frames + 1, dtype=np.float64)], axis=1
        )
        for i in range(n):
            fine = l2n(
                rng.standard_normal((frames * regions, d_f), dtype=np.float32)
            ).reshape(frames, regions * d_f)
            coarse = l2n(
                rng.standard_normal((frames, d_c), dtype=np.float32)
            )
            vid = f"{prefix}{i:06d}"
            out_fine[vid] = VideoFeature(
                video_id=vid, timestamps=ts, feature=fine
            )
            out_coarse.append(VideoFeature(
                video_id=vid, timestamps=ts, feature=coarse
            ))
        return out_fine, out_coarse

    q_fine, q_coarse = make("Q", n_videos)
    r_fine, r_coarse = make("R", n_videos)
    # The first arm is the XLA formulation by construction (metric
    # continuity with rounds 1-3; the kernel is the TPU DEFAULT since
    # round 4, so force the routing off) — the prior value is restored
    # by the try/finally below, which also covers exceptions during
    # loc construction / the XLA arm (the forced-off flag must never
    # leak into code that continues in this process).
    import jax

    from vsc2022_tpu.baseline import dns_baseline as D

    prior_flag = os.environ.get("VSC2022_TPU_CHAMFER_PALLAS")
    pairs = [
        CandidatePair(
            query_id=f"Q{rng.integers(n_videos):06d}",
            ref_id=f"R{rng.integers(n_videos):06d}",
            score=1.0,
        )
        for _ in range(n_pairs)
    ]
    try:
        os.environ["VSC2022_TPU_CHAMFER_PALLAS"] = "0"
        D._gathered_dns_sims.clear_cache()
        loc = DnSLocalization(
            q_fine, r_fine, q_coarse, r_coarse,
            model_type="TN", fg_type="att", tn_max_step=5, min_length=4,
            similarity_bias=0.5,
        )
        loc.localize_all(pairs[: max(4, n_pairs // 8)])  # warm + stage
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loc.localize_all(pairs)
            best = min(best, time.perf_counter() - t0)
        results["dns_localization_pairs_per_sec"] = round(
            len(pairs) / best, 1
        )

        # Fused-Pallas-chamfer A/B on the same workload, recorded every
        # round so the kernel-vs-XLA comparison cannot go stale. The env
        # routing is read at trace time, so the cached sims executable
        # must be dropped around the arm.
        if jax.default_backend() == "tpu":
            try:
                os.environ["VSC2022_TPU_CHAMFER_PALLAS"] = "1"
                D._gathered_dns_sims.clear_cache()
                loc_k = DnSLocalization(
                    q_fine, r_fine, q_coarse, r_coarse,
                    model_type="TN", fg_type="att", tn_max_step=5,
                    min_length=4, similarity_bias=0.5,
                )
                loc_k.localize_all(pairs[: max(4, n_pairs // 8)])
                best_k = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    loc_k.localize_all(pairs)
                    best_k = min(best_k, time.perf_counter() - t0)
                results["dns_localization_pairs_per_sec_kernel"] = round(
                    len(pairs) / best_k, 1
                )
            except Exception as exc:  # noqa: BLE001
                print(f"dns chamfer-kernel arm skipped: {exc}",
                      file=sys.stderr)
    finally:
        if prior_flag is None:
            os.environ.pop("VSC2022_TPU_CHAMFER_PALLAS", None)
        else:
            os.environ["VSC2022_TPU_CHAMFER_PALLAS"] = prior_flag
        D._gathered_dns_sims.clear_cache()

    # Steady-state throughput at PRODUCTION defaults: a 2-chunk run
    # (each chunk = the localizer's HBM budget at this bucket), where
    # localize_all's lag-1 chunk pipelining overlaps each chunk's
    # packed D2H pull with the next chunk's device compute — the
    # single-512-pair metric above is a latency figure that pays its
    # round trips unamortized. `loc`'s tables are already staged and
    # its sims cache was cleared above, so this retraces with the
    # production default routing — no table restage.
    from vsc2022_tpu.localization.localize import _bucket

    nb = _bucket(frames)
    n_steady = 2 * max(
        1, DnSLocalization.sim_element_budget // (nb * nb)
    )
    if _TINY:
        n_steady = 16
    pairs_steady = [
        CandidatePair(
            query_id=f"Q{rng.integers(n_videos):06d}",
            ref_id=f"R{rng.integers(n_videos):06d}",
            score=1.0,
        )
        for _ in range(n_steady)
    ]
    loc.localize_all(pairs_steady[: n_steady // 2])  # warm the chunk shape
    steady = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loc.localize_all(pairs_steady)
        steady = min(steady, time.perf_counter() - t0)
    results["dns_localization_pairs_per_sec_steady"] = round(
        n_steady / steady, 1
    )


_WORKLOAD_FNS = {
    "retrieval": bench_retrieval,
    "inference": bench_inference,
    "localization": bench_localization,
    "dns_localization": bench_dns_localization,
}


def run_measurement(scratch_path=None):
    global _DEADLINE

    from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    _DEADLINE = time.monotonic() + 0.9 * CHILD_BUDGET
    results = _FlushingResults(scratch_path)
    results.update({
        "metric": "query_videos_per_sec",
        "unit": "videos/s",
        "baseline": "numpy brute force on host CPU (faiss not installed)",
        "workloads_done": [],
    })
    stall = os.environ.get("VSC2022_TPU_BENCH_STALL")
    done = []
    for name in WORKLOADS:
        if name == stall:  # test hook: simulate a relay stall here
            time.sleep(100_000)
        if done and _budget_left() < 60:
            # Budget nearly spent: ship what completed rather than be
            # killed mid-workload (the flush keeps it either way).
            print(f"budget: skipping {name} onward", file=sys.stderr)
            break
        _WORKLOAD_FNS[name](results)
        done.append(name)
        results["workloads_done"] = list(done)
    if "retrieval_qps" in results:
        results["value"] = results["retrieval_qps"]
    missing = [w for w in WORKLOADS if w not in done]
    if missing:
        results["incomplete"] = missing
    print(json.dumps(dict(results)))


def bench_serving(results):
    """Warm request latency against a RESIDENT SERVER PROCESS — the
    full serving story (stage once, answer repeated requests over the
    wire, candidates + TN matches per request). Runs in the bench
    parent AFTER the measurement child exits: only one process can
    hold the chip on this rig. Failure leaves the core bench intact
    (the metric is simply absent that round).

    serving_warm_compute_s is the relay-jitter-FREE figure: the
    server-side repetition-differenced device compute of the fused SN
    search dispatch plus the TN alignment batches at the warm
    request's shapes (serve.py `probe`). serving_warm_request_s /
    serving_warm_server_s remain dispatch-RPC-bound — read them
    alongside rpc_floor_ms; judge regressions on the compute figure."""
    from vsc2022_tpu.metrics import Dataset
    from vsc2022_tpu.retrieval.client import ServeClient
    from vsc2022_tpu.storage import store_features
    from vsc2022_tpu.types import VideoFeature

    rng = np.random.default_rng(11)
    n_serve_refs = 40 if _TINY else 200  # latency metric, not throughput

    def videos(prefix, n, start=0, frames=FRAMES):
        out = []
        for i in range(start, start + n):
            f = l2n(rng.standard_normal((frames, DIM), dtype=np.float32))
            out.append(VideoFeature(
                video_id=f"{prefix}{i:06d}",
                timestamps=np.arange(frames, dtype=np.float64),
                feature=f,
            ))
        return out

    refs = videos("R", n_serve_refs)
    queries = videos("Q", 5 if _TINY else 30)
    if _TINY:
        queries[0].feature[1:9] = refs[0].feature[0:8]  # planted copy
    else:
        queries[0].feature[10:30] = refs[0].feature[5:25]
    noise = videos("R", 20 if _TINY else 100, start=9000)  # disjoint ids
    with tempfile.TemporaryDirectory(prefix="bench_serve_") as tmp:
        r_npz = os.path.join(tmp, "r.npz")
        q_npz = os.path.join(tmp, "q.npz")
        n_npz = os.path.join(tmp, "noise.npz")
        store_features(r_npz, refs, Dataset.REFS)
        store_features(q_npz, queries, Dataset.QUERIES)
        store_features(n_npz, noise, Dataset.REFS)

        t0 = time.perf_counter()
        client = ServeClient.spawn(
            r_npz, score_norm_features=n_npz, matches=True,
            stderr=subprocess.DEVNULL,
        )
        try:
            startup_s = time.perf_counter() - t0
            client.search(q_npz)  # warm the request shapes (compile)
            best = float("inf")
            best_server = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                res = client.search(q_npz)
                best = min(best, time.perf_counter() - t0)
                # Server-reported handler time (the response's last
                # field): excludes client wire/pipe overhead, so it
                # tracks the server's own work. Still dispatch-RPC
                # bound — read it alongside rpc_floor_ms.
                best_server = min(best_server, res.seconds)
            assert res.n_candidates > 0 and res.n_matches > 0
            results["serving_startup_s"] = round(startup_s, 2)
            results["serving_warm_request_s"] = round(best, 3)
            results["serving_warm_server_s"] = round(best_server, 3)
            search_c, tn_c = client.probe(q_npz)
            results["serving_probe_search_s"] = round(search_c, 4)
            results["serving_probe_tn_s"] = round(tn_c, 4)
            results["serving_warm_compute_s"] = round(search_c + tn_c, 4)
        finally:
            client.close(shutdown=True)


def _preflight():
    """Tiny relay liveness probe: backend init + one jitted op. Run in
    its own child under a hard timeout — backend init HANGS (rather
    than failing) during this rig's multi-hour relay outages, and a
    hung probe must not consume the measurement budget."""
    if os.environ.get("VSC2022_TPU_BENCH_STALL") == "preflight":
        time.sleep(100_000)  # test hook: simulate a relay-outage hang
    import jax

    if os.environ.get("VSC2022_TPU_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(0.0)))
    print("preflight-ok")


def _outage_json(error: str) -> str:
    return json.dumps({
        "metric": "query_videos_per_sec",
        "unit": "videos/s",
        "value": 0.0,
        "vs_baseline": 0.0,
        "error": error,
    })


def _recover_partial(scratch_path):
    """Compose the bench output from whatever the killed/dead child
    flushed: the recorded metrics plus an `incomplete` list. None when
    the scratch holds nothing usable (outage before any metric)."""
    try:
        with open(scratch_path) as f:
            results = json.load(f)
    except Exception:
        return None
    done = results.get("workloads_done", [])
    if not results.get("retrieval_qps") and not done:
        return None
    results["incomplete"] = [w for w in WORKLOADS if w not in done]
    results["note"] = (
        "measurement child did not finish (timeout or crash); "
        "partial results recovered from the incremental flush"
    )
    if "value" not in results and "retrieval_qps" in results:
        results["value"] = results["retrieval_qps"]
    results.setdefault("vs_baseline", 0.0)
    return results


def _run_child(args, timeout):
    """subprocess.run with a PROCESS-GROUP kill on timeout.

    The serving child spawns a server grandchild; plain subprocess.run
    SIGKILLs only the direct child on timeout, after which it blocks
    reading the stdout/stderr pipes until EOF — pipes the surviving
    server still holds open, so the bench parent HANGS FOREVER (and
    the orphan server keeps the TPU chip lease, poisoning the NEXT
    run's preflight — both observed live). Each child starts as its
    own session leader and the whole group dies together; PDEATHSIG
    covers the reverse direction (the DRIVER killing this parent at
    its own deadline — round 4's failure mode — must not leave a
    chip-holding orphan behind)."""
    from vsc2022_tpu.utils.procs import die_with_parent

    proc = subprocess.Popen(
        args, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, start_new_session=True, preexec_fn=die_with_parent,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
        return subprocess.CompletedProcess(args, proc.returncode, out, err)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            proc.communicate(timeout=10)
        except Exception:  # noqa: BLE001
            pass
        raise


def main():
    """Parent orchestration: preflight probe -> one measurement child
    (incremental scratch flush) -> serving child. Each stage runs in
    its own process under its own hard timeout: the TPU relay on this
    rig stalls processes outright (multi-hour outages observed), only
    one process can hold the chip, and a lost child must cost at most
    its own stage — never the round (round 4 recorded NOTHING when the
    old 2x1200 s retry loop outlived the driver's window)."""
    if "--_child" in sys.argv:
        idx = sys.argv.index("--_child")
        scratch = sys.argv[idx + 1] if len(sys.argv) > idx + 1 else None
        run_measurement(scratch)
        return
    if "--_probe" in sys.argv:
        _preflight()
        return
    if "--_serve_child" in sys.argv:
        # Test hook: simulate the relay-stall mode (a fresh process's
        # backend init hanging at ~0% CPU) on the FIRST attempt only —
        # the marker file makes the retry attempt succeed.
        if os.environ.get("VSC2022_TPU_BENCH_STALL") == "serving_once":
            marker = os.environ.get("VSC2022_TPU_BENCH_STALL_MARKER", "")
            if marker and not os.path.exists(marker):
                open(marker, "w").close()
                time.sleep(100_000)
        serve_results = {}
        bench_serving(serve_results)
        print(json.dumps(serve_results))
        return

    me = os.path.abspath(__file__)
    # 1. Preflight: an outage prints the explicit outage JSON in ~5
    # minutes, not after the whole measurement budget. TWO attempts
    # with a backoff between them: the relay holds the chip lease for
    # a short while after a client is SIGKILLed (e.g. a prior bench's
    # budget-killed child — or the builder's own last TPU process just
    # before the driver runs this), and the next backend init hangs
    # until it lapses. A single 90 s probe misreads that as a real
    # outage; only both attempts failing does.
    for attempt in (1, 2):
        err = None
        try:
            probe = _run_child(
                [sys.executable, me, "--_probe"], timeout=PREFLIGHT_BUDGET
            )
            if probe.returncode != 0 or "preflight-ok" not in probe.stdout:
                print(probe.stderr[-1000:], file=sys.stderr)
                err = "relay preflight failed (TPU backend init error)"
        except subprocess.TimeoutExpired:
            err = (
                "relay preflight timed out "
                f"(TPU unreachable; {PREFLIGHT_BUDGET}s x{attempt})"
            )
        if err is None:
            break
        if attempt == 1:
            print(f"preflight attempt 1: {err}; retrying after lease "
                  "backoff", file=sys.stderr)
            time.sleep(PREFLIGHT_BACKOFF)
    if err is not None:
        print(_outage_json(err))
        return

    # 2. One measurement child, incremental scratch flush, single
    # attempt inside the budget (a retry on a stalled relay would just
    # double the damage — the flush already saved what completed).
    fd, scratch = tempfile.mkstemp(prefix="bench_scratch_", suffix=".json")
    os.close(fd)
    os.unlink(scratch)  # child creates it at first flush
    results = None
    try:
        try:
            child = _run_child(
                [sys.executable, me, "--_child", scratch],
                timeout=CHILD_BUDGET + KILL_GRACE,
            )
        except subprocess.TimeoutExpired:
            print("measurement child timed out", file=sys.stderr)
            child = None
        if child is not None:
            lines = [
                ln for ln in child.stdout.strip().splitlines()
                if ln.startswith("{")
            ]
            if child.returncode == 0 and lines:
                results = json.loads(lines[-1])
            else:
                print(child.stderr[-2000:], file=sys.stderr)
        if results is None:
            results = _recover_partial(scratch)
    finally:
        try:
            os.unlink(scratch)
        except OSError:
            pass
    if results is None:
        print(_outage_json(
            "measurement child recorded nothing "
            "(TPU stalled after preflight)"
        ))
        return

    # 3. Serving workload in its own child (the measurement child held
    # the chip until exit); failure costs only the serving metrics —
    # but it must COST VISIBLY: a timed-out/failed serving child lands
    # in the JSON's incomplete list, not just on stderr.
    if os.environ.get("VSC2022_TPU_BENCH_NO_SERVE") != "1":
        # TWO attempts, like the preflight: the relay occasionally
        # stalls a FRESH process's backend init indefinitely at ~0%
        # CPU (observed live: the same serving child ran 128 s one
        # process and hung >400 s the next) — the documented playbook
        # is kill and retry once, after the lease backoff.
        serve_ok = False
        attempts = int(
            os.environ.get("VSC2022_TPU_BENCH_SERVE_ATTEMPTS", "2")
        )
        for attempt in range(1, attempts + 1):
            if attempt > 1:
                print(
                    "serving child stalled; retrying once after lease "
                    "backoff", file=sys.stderr,
                )
                time.sleep(PREFLIGHT_BACKOFF)
            try:
                serve = _run_child(
                    [sys.executable, me, "--_serve_child"],
                    timeout=SERVE_BUDGET,
                )
                serve_lines = [
                    ln for ln in serve.stdout.strip().splitlines()
                    if ln.startswith("{")
                ]
                if serve.returncode == 0 and serve_lines:
                    results.update(json.loads(serve_lines[-1]))
                    serve_ok = True
                    break
                print(serve.stderr[-1000:], file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                print(f"serving attempt {attempt} failed: {exc}",
                      file=sys.stderr)
        if not serve_ok:
            results["incomplete"] = results.get("incomplete", []) + [
                "serving"
            ]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
