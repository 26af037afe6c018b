"""TN localization tests: planted-copy recovery (modeled on reference
tests/test_localization.py) plus direct DP-kernel checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from vsc2022_tpu.localization import TNLocalizationMaxSim
from vsc2022_tpu.metrics import CandidatePair
from vsc2022_tpu.ops.tn_align import TNParams, tn_align
from vsc2022_tpu.types import VideoFeature

D = 64


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_feature(i, feature, timestamps=None):
    if timestamps is None:
        timestamps = np.arange(feature.shape[0]) * 1.0
    return VideoFeature(video_id=i, feature=feature, timestamps=timestamps)


def make_planted_case(rng):
    a = l2n(rng.normal(size=(45, D))).astype(np.float32)
    b = l2n(rng.normal(size=(30, D))).astype(np.float32)
    c = l2n(rng.normal(size=(60, D))).astype(np.float32)
    a[20:30, :] = c[30:40, :]
    queries = [make_feature(1, a)]
    refs = [make_feature(2, b), make_feature(3, c)]
    return queries, refs


class TestTNAlignKernel:
    def run_align(self, sim, params=TNParams()):
        sim = jnp.asarray(sim[None], dtype=jnp.float32)
        q_len = jnp.asarray([sim.shape[1]], dtype=jnp.int32)
        r_len = jnp.asarray([sim.shape[2]], dtype=jnp.int32)
        boxes, valid, scores = tn_align(sim, q_len, r_len, params)
        return np.asarray(boxes[0]), np.asarray(valid[0]), np.asarray(scores[0])

    def test_single_diagonal(self):
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(10):
            sim[5 + t, 12 + t] = 0.9
        boxes, valid, scores = self.run_align(sim)
        assert valid[0]
        np.testing.assert_array_equal(boxes[0], [5, 12, 14, 21])
        assert scores[0] == pytest.approx(0.9)
        assert not valid[1:].any()

    def test_min_length_filter(self):
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(3):  # below min_length=4
            sim[5 + t, 12 + t] = 0.9
        _, valid, _ = self.run_align(sim)
        assert not valid.any()

    def test_gap_within_max_step(self):
        # Path with gaps of 3 frames still forms one segment (max_step=5).
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(0, 24, 3):
            sim[10 + t, 20 + t] = 0.8
        boxes, valid, _ = self.run_align(sim)
        assert valid[0]
        np.testing.assert_array_equal(boxes[0], [10, 20, 31, 41])

    def test_gap_beyond_max_step_splits(self):
        # A 10-frame hole (> max_step) must split into two segments.
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(6):
            sim[t, t] = 0.8
        for t in range(20, 26):
            sim[t, t] = 0.8
        boxes, valid, _ = self.run_align(sim)
        assert valid[0] and valid[1]
        got = sorted(boxes[p].tolist() for p in range(2))
        assert got == [[0, 0, 5, 5], [20, 20, 25, 25]]

    def test_two_separate_paths(self):
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(8):
            sim[5 + t, 40 + t] = 0.9  # path 1
            sim[40 + t, 5 + t] = 0.7  # path 2 (reversed corner)
        boxes, valid, scores = self.run_align(sim)
        assert valid[0] and valid[1]
        assert not valid[2:].any()
        got = sorted(boxes[p].tolist() for p in range(2))
        assert got == [[5, 40, 12, 47], [40, 5, 47, 12]]

    def test_below_min_sim_ignored(self):
        sim = np.full((32, 32), 0.1, dtype=np.float32)  # below min_sim=0.2
        for t in range(10):
            sim[t, t] = 0.15
        _, valid, _ = self.run_align(sim)
        assert not valid.any()

    def test_padding_is_inert(self):
        # Identical content in a larger padded buffer must give same boxes.
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(10):
            sim[5 + t, 12 + t] = 0.9
        big = np.full((64, 96), 5.0, dtype=np.float32)  # junk in padding
        big[:32, :40] = sim
        sims = jnp.asarray(big[None])
        boxes, valid, _ = tn_align(
            sims, jnp.asarray([32], jnp.int32), jnp.asarray([40], jnp.int32)
        )
        assert np.asarray(valid)[0, 0]
        np.testing.assert_array_equal(np.asarray(boxes)[0, 0], [5, 12, 14, 21])


class TestTNLocalization:
    def test_localize_planted_copy(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        localization = TNLocalizationMaxSim(queries, refs, "TN")
        # No matches for the unrelated pair:
        matches = localization.localize(CandidatePair(1, 2, 1.0))
        assert len(matches) == 0
        # The planted pair localizes to the copied region:
        matches = localization.localize(CandidatePair(1, 3, 2.0))
        assert len(matches) >= 1
        m = matches[0]
        assert m.query_id == 1 and m.ref_id == 3
        # Box should cover the planted region (query 20-29 ↔ ref 30-39).
        assert m.query_start <= 21 and m.query_end >= 28
        assert m.ref_start <= 31 and m.ref_end >= 38
        assert m.score == pytest.approx(1.0, abs=0.05)

    def test_localize_all_batches(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        localization = TNLocalizationMaxSim(queries, refs, "TN")
        matches = localization.localize_all(
            [CandidatePair(1, 2, 1.0), CandidatePair(1, 3, 2.0)]
        )
        assert len(matches) >= 1
        for match in matches:
            assert match.query_id == 1
            assert match.ref_id == 3

    def test_add_refs_grows_table_device_side(self):
        # Growing a staged localizer must reuse the resident ref table
        # (device-side concat, offsets absolute) and align added pairs
        # identically to a fresh localizer over the combined refs.
        rng = np.random.RandomState(7)
        queries, refs = make_planted_case(rng)
        new_ref = l2n(rng.normal(size=(50, D))).astype(np.float32)
        new_ref[5:15, :] = queries[0].feature[30:40, :]  # plant in the add
        added = [make_feature(9, new_ref)]
        pairs = [CandidatePair(1, 3, 2.0), CandidatePair(1, 9, 2.0)]

        grown = TNLocalizationMaxSim(queries, refs, "TN")
        grown.localize_all([CandidatePair(1, 3, 2.0)])  # stage tables
        table = grown._r_table
        grown.add_refs(added)
        assert grown._r_table is not None
        assert grown._r_table.shape[0] == table.shape[0] + 50
        got = grown.localize_all(pairs)

        fresh = TNLocalizationMaxSim(queries, refs + added, "TN")
        expect = fresh.localize_all(pairs)
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )
        assert sorted(key(m) for m in got) == sorted(key(m) for m in expect)
        assert any(m.ref_id == 9 for m in got)

    def test_remove_refs_compacts_table_device_side(self):
        # Removing a staged localizer's ref must compact the resident
        # table (device-side gather, HBM reclaimed) and align the
        # survivors identically to a fresh localizer over them.
        rng = np.random.RandomState(9)
        queries, refs = make_planted_case(rng)

        shrunk = TNLocalizationMaxSim(queries, refs, "TN")
        shrunk.localize_all([CandidatePair(1, 3, 2.0)])  # stage tables
        table = shrunk._r_table
        shrunk.remove_refs([2])  # drop the non-planted ref
        assert shrunk._r_table.shape[0] == (
            table.shape[0] - refs[0].feature.shape[0]
        )
        assert 2 not in shrunk.refs and 2 not in shrunk._r_offs
        with pytest.raises(KeyError, match="not staged"):
            shrunk.remove_refs([2])
        got = shrunk.localize_all([CandidatePair(1, 3, 2.0)])

        fresh = TNLocalizationMaxSim(queries, [refs[1]], "TN")
        expect = fresh.localize_all([CandidatePair(1, 3, 2.0)])
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )
        assert sorted(key(m) for m in got) == sorted(key(m) for m in expect)
        assert len(got) >= 1

    def test_reference_signature_accepted(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        # The reference construction signature must work as-is
        # (reference: vsc/baseline/sscd_baseline.py:118-126).
        loc = TNLocalizationMaxSim(
            queries,
            refs,
            model_type="TN",
            tn_max_step=5,
            min_length=4,
            concurrency=16,
            similarity_bias=0.5,
        )
        matches = loc.localize_all([CandidatePair(1, 3, 2.0)])
        assert len(matches) >= 1
        # MaxSim score is bias-corrected.
        assert matches[0].score == pytest.approx(1.0, abs=0.05)

    def test_unsupported_model_type(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        with pytest.raises(ValueError):
            TNLocalizationMaxSim(queries, refs, "DTW")


class TestTNSpeedChange:
    """Speed-changed copies produce non-unit-slope diagonals; TN's
    step window (max_step=5) must still chain them."""

    def run_align(self, sim, params=TNParams()):
        sims = jnp.asarray(sim[None], dtype=jnp.float32)
        q_len = jnp.asarray([sim.shape[0]], dtype=jnp.int32)
        r_len = jnp.asarray([sim.shape[1]], dtype=jnp.int32)
        boxes, valid, scores = tn_align(sims, q_len, r_len, params)
        return np.asarray(boxes[0]), np.asarray(valid[0])

    def test_double_speed_copy(self):
        # Ref plays at 2x inside the query: q frame t matches r frame 2t.
        sim = np.zeros((64, 96), dtype=np.float32)
        for t in range(12):
            sim[10 + t, 20 + 2 * t] = 0.9
        boxes, valid = self.run_align(sim)
        assert valid[0]
        x1, y1, x2, y2 = boxes[0]
        assert x1 == 10 and x2 == 21
        assert y1 == 20 and y2 == 42

    def test_half_speed_copy(self):
        sim = np.zeros((96, 64), dtype=np.float32)
        for t in range(12):
            sim[10 + 2 * t, 20 + t] = 0.9
        boxes, valid = self.run_align(sim)
        assert valid[0]
        x1, y1, x2, y2 = boxes[0]
        assert x1 == 10 and x2 == 32
        assert y1 == 20 and y2 == 31

    def test_slope_beyond_max_step_not_chained(self):
        # 8x speed: steps of 8 exceed max_step=5 → no segment of
        # length >= min_length can form.
        sim = np.zeros((32, 128), dtype=np.float32)
        for t in range(8):
            sim[4 + t, 8 * t] = 0.9
        _, valid = self.run_align(sim)
        assert not valid.any()

    def test_noisy_planted_copy_features(self):
        # End-to-end: features with additive noise, 1.5x speed ratio.
        rng = np.random.RandomState(3)
        d = 64

        def l2n(x):
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        ref = l2n(rng.normal(size=(60, d))).astype(np.float32)
        query = l2n(rng.normal(size=(48, d))).astype(np.float32)
        # Query frames 12..27 copy ref frames 20..44 at ~1.5x speed.
        for i in range(16):
            src = 20 + int(round(1.5 * i))
            noisy = ref[src] + 0.15 * rng.normal(size=d).astype(np.float32)
            query[12 + i] = noisy / np.linalg.norm(noisy)
        queries = [make_feature(1, query)]
        refs = [make_feature(2, ref)]
        loc = TNLocalizationMaxSim(queries, refs, "TN")
        matches = loc.localize_all([CandidatePair(1, 2, 1.0)])
        assert len(matches) >= 1
        m = max(matches, key=lambda x: x.score)
        assert m.query_start <= 14 and m.query_end >= 25
        assert m.ref_start <= 23 and m.ref_end >= 40


def oracle_tn(sim, params):
    """Independent O(NQ·NR·step²) Python implementation of the TN DP
    (same semantics: gated nodes, windowed predecessors, longest path by
    (node count, simsum), endpoint boxes, box masking, multi-path)."""
    nq, nr = sim.shape
    thr = max(params.min_sim, sim.mean() + params.adaptive_sigma * sim.std())
    if params.top_k_per_row < nr:
        kth = np.sort(sim, axis=1)[:, -params.top_k_per_row][:, None]
        topk_mask = sim >= kth
    else:
        topk_mask = np.ones_like(sim, dtype=bool)
    nodes = topk_mask & (sim >= thr)

    results = []
    for _ in range(params.max_paths):
        ln = np.zeros((nq, nr), dtype=int)
        sm = np.full((nq, nr), -np.inf)
        si = np.zeros((nq, nr), dtype=int)
        sj = np.zeros((nq, nr), dtype=int)
        for i in range(nq):
            for j in range(nr):
                if not nodes[i, j]:
                    continue
                best = (0, -np.inf, i, j)
                # Tie convention matches the kernel: largest predecessor
                # column first, then smallest row (ties are otherwise
                # measure-zero on continuous sims).
                for dj in range(1, params.max_step + 1):
                    for di in range(1, params.max_step + 1):
                        pi, pj = i - di, j - dj
                        if pi < 0 or pj < 0 or ln[pi, pj] == 0:
                            continue
                        cand = (ln[pi, pj], sm[pi, pj], si[pi, pj], sj[pi, pj])
                        if (cand[0], cand[1]) > (best[0], best[1]):
                            best = cand
                if best[0] > 0:
                    ln[i, j] = best[0] + 1
                    sm[i, j] = best[1] + sim[i, j]
                    si[i, j], sj[i, j] = best[2], best[3]
                else:
                    ln[i, j] = 1
                    sm[i, j] = sim[i, j]
                    si[i, j], sj[i, j] = i, j
        eligible = ln >= params.min_length
        if not eligible.any():
            break
        # best cell by (ln, sm) lexicographic
        best_val = None
        best_cell = None
        for i in range(nq):
            for j in range(nr):
                if not eligible[i, j]:
                    continue
                v = (ln[i, j], sm[i, j])
                if best_val is None or v > best_val:
                    best_val = v
                    best_cell = (i, j)
        i, j = best_cell
        box = (si[i, j], sj[i, j], i, j)
        results.append(box)
        nodes[box[0] : box[2] + 1, box[1] : box[3] + 1] = False
    return results


class TestTNFuzz:
    def test_kernel_matches_oracle(self):
        rng = np.random.RandomState(17)
        params = TNParams(max_step=3, min_length=3, max_paths=4,
                          min_sim=0.5, top_k_per_row=4, adaptive_sigma=0.0)
        for trial in range(8):
            nq = int(rng.randint(8, 24))
            nr = int(rng.randint(8, 24))
            sim = rng.rand(nq, nr).astype(np.float32)
            # sparsify so paths are nontrivial
            sim = np.where(rng.rand(nq, nr) < 0.75, sim * 0.3, sim)
            expect = oracle_tn(sim.astype(np.float64), params)
            boxes, valid, _ = tn_align(
                jnp.asarray(sim[None]),
                jnp.asarray([nq], jnp.int32),
                jnp.asarray([nr], jnp.int32),
                params,
            )
            boxes = np.asarray(boxes[0])
            valid = np.asarray(valid[0])
            got = [tuple(boxes[p]) for p in range(len(valid)) if valid[p]]
            assert got == [tuple(map(int, b)) for b in expect], (
                trial, got, expect
            )


def oracle_tn_vcsl(sim, max_step=5, min_length=4, max_paths=10,
                   min_sim=0.2, top_k=5, max_iou=0.3):
    """VCSL-faithful TN oracle, reconstructed from the published
    semantics (VCSL paper sec. 4.2 + alipay/VCSL vta.py TN interface:
    tn_top_K per-row frame retrieval, absolute min_sim gate, DAG over
    forward steps <= tn_max_step, nx.dag_longest_path per iteration with
    the path's NODES removed from the graph — not its bounding box —
    and max_iou box dedup). Implemented with explicit parent pointers
    and traceback, deliberately unlike the kernel's endpoint-box scan,
    so a shared misreading of the DP cannot hide."""
    nq, nr = sim.shape
    if top_k < nr:
        kth = np.sort(sim, axis=1)[:, -top_k][:, None]
        nodes = (sim >= kth) & (sim >= min_sim)
    else:
        nodes = sim >= min_sim
    nodes = nodes.copy()

    accepted = []
    for _ in range(max_paths):
        ln = np.zeros((nq, nr), dtype=int)
        sm = np.full((nq, nr), -np.inf)
        parent = {}
        for i in range(nq):
            for j in range(nr):
                if not nodes[i, j]:
                    continue
                best = None  # (ln, sum, cell)
                # Exact (length, simsum) ties between predecessors are
                # implementation-defined in VCSL/networkx; this oracle
                # pins the kernel's convention (largest predecessor
                # column, then smallest row) by scan order.
                for pj in range(j - 1, max(0, j - max_step) - 1, -1):
                    for pi in range(max(0, i - max_step), i):
                        if ln[pi, pj] == 0:
                            continue
                        cand = (ln[pi, pj], sm[pi, pj], (pi, pj))
                        if best is None or (cand[0], cand[1]) > (
                            best[0], best[1]
                        ):
                            best = cand
                if best is None:
                    ln[i, j], sm[i, j] = 1, sim[i, j]
                else:
                    ln[i, j] = best[0] + 1
                    sm[i, j] = best[1] + sim[i, j]
                    parent[(i, j)] = best[2]
        # Longest path endpoint, simsum tie-break.
        flat_best = None
        for i in range(nq):
            for j in range(nr):
                if ln[i, j] == 0:
                    continue
                v = (ln[i, j], sm[i, j])
                if flat_best is None or v > flat_best[0]:
                    flat_best = (v, (i, j))
        if flat_best is None or flat_best[0][0] < min_length:
            break
        # Traceback: collect the path cells, remove them from the graph.
        cell = flat_best[1]
        path = [cell]
        while cell in parent:
            cell = parent[cell]
            path.append(cell)
        for (i, j) in path:
            nodes[i, j] = False
        box = (
            min(i for i, _ in path), min(j for _, j in path),
            max(i for i, _ in path), max(j for _, j in path),
        )

        def iou(a, b):
            ix = max(0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
            iy = max(0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
            inter = ix * iy
            area = lambda t: (t[2] - t[0] + 1) * (t[3] - t[1] + 1)  # noqa: E731
            return inter / float(area(a) + area(b) - inter)

        if all(iou(box, prev) <= max_iou for prev in accepted):
            accepted.append(box)
    return accepted


def networkx_tn(sim, max_step=5, min_length=4, max_paths=10,
                min_sim=0.2, top_k=5, max_iou=0.3):
    """A LITERAL temporal-network implementation on networkx — the
    library upstream VCSL's TN actually uses (vsc/baseline/
    localization.py:44 → alipay/VCSL vta.py): gated cells become DiGraph
    nodes, forward steps ≤ max_step in both axes become edges, and each
    iteration extracts ``nx.dag_longest_path`` (default weights: most
    nodes) and removes its nodes. Path-length TIES resolve by
    networkx's internal iteration order, which is implementation-
    defined — so exact-equality checks against it are only meaningful
    on instances whose longest path is unique at every iteration."""
    import networkx as nx

    nq, nr = sim.shape
    if top_k < nr:
        kth = np.sort(sim, axis=1)[:, -top_k][:, None]
        nodes = (sim >= kth) & (sim >= min_sim)
    else:
        nodes = sim >= min_sim
    cells = {tuple(map(int, c)) for c in np.argwhere(nodes)}
    graph = nx.DiGraph()
    graph.add_nodes_from(cells)
    for (i, j) in cells:
        for di in range(1, max_step + 1):
            for dj in range(1, max_step + 1):
                if (i + di, j + dj) in cells:
                    graph.add_edge((i, j), (i + di, j + dj))

    def iou(a, b):
        ix = max(0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        iy = max(0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter = ix * iy
        area = lambda t: (t[2] - t[0] + 1) * (t[3] - t[1] + 1)  # noqa: E731
        return inter / float(area(a) + area(b) - inter)

    accepted = []
    for _ in range(max_paths):
        if graph.number_of_nodes() == 0:
            break
        path = nx.dag_longest_path(graph)
        if len(path) < min_length:
            break
        graph.remove_nodes_from(path)
        box = (
            min(i for i, _ in path), min(j for _, j in path),
            max(i for i, _ in path), max(j for _, j in path),
        )
        if all(iou(box, prev) <= max_iou for prev in accepted):
            accepted.append(box)
    return accepted


class TestNetworkxCrossValidation:
    """Three-way crosscheck of the VCSL-faithful TN on instances whose
    longest path is UNIQUE at every iteration (so networkx's
    implementation-defined tie order cannot differ): the literal
    networkx implementation, the reconstructed parent-pointer oracle,
    and the scan kernel must emit identical box sequences. This pins
    the graph semantics (strict forward steps ≤ max_step in both axes,
    longest-by-node-count extraction, node removal, IoU dedup) against
    the actual library upstream delegates to."""

    def test_planted_paths_three_way_fuzz(self):
        rng = np.random.RandomState(77)
        max_step, min_length = 3, 4
        params = TNParams.vcsl_faithful(
            max_step=max_step, min_length=min_length, max_paths=6
        )
        for trial in range(12):
            n = 48
            sim = np.zeros((n, n), dtype=np.float32)
            n_paths = int(rng.randint(1, 4))
            # Distinct lengths → a unique longest path each iteration;
            # bands separated by > max_step in both axes → no cross
            # edges between planted paths.
            lengths = rng.choice(np.arange(4, 12), n_paths, replace=False)
            row = col = 0
            expected_spans = []
            for ln in lengths:
                row += int(rng.randint(0, 2))
                for t in range(ln):
                    sim[row + t, col + t] = 0.5 + 0.4 * rng.rand()
                expected_spans.append((row, col, row + ln - 1, col + ln - 1))
                row += int(ln) + max_step + 1
                col += int(ln) + max_step + 1
            kw = dict(
                max_step=max_step, min_length=min_length, max_paths=6,
                min_sim=params.min_sim, top_k=params.top_k_per_row,
                max_iou=params.max_iou,
            )
            via_nx = networkx_tn(sim.astype(np.float64), **kw)
            via_oracle = oracle_tn_vcsl(sim.astype(np.float64), **kw)
            boxes, valid, _ = tn_align(
                jnp.asarray(sim[None]),
                jnp.asarray([n], jnp.int32),
                jnp.asarray([n], jnp.int32),
                params,
            )
            via_kernel = [
                tuple(map(int, np.asarray(boxes[0][p])))
                for p in range(boxes.shape[1])
                if bool(valid[0][p])
            ]
            assert via_nx == via_oracle == via_kernel, (
                trial, via_nx, via_oracle, via_kernel
            )
            # And they are exactly the planted paths, longest first.
            order = np.argsort(-lengths, kind="stable")
            assert via_nx == [expected_spans[int(o)] for o in order], trial


class TestVCSLFaithfulMode:
    """The parity configuration (TNParams.vcsl_faithful) must reproduce
    the published VCSL TN semantics, checked against an independent
    parent-pointer oracle."""

    def test_kernel_matches_vcsl_oracle_fuzz(self):
        rng = np.random.RandomState(23)
        params = TNParams.vcsl_faithful(max_step=3, min_length=3,
                                        max_paths=5)
        for trial in range(10):
            nq = int(rng.randint(8, 26))
            nr = int(rng.randint(8, 26))
            sim = rng.rand(nq, nr).astype(np.float32)
            sim = np.where(rng.rand(nq, nr) < 0.7, sim * 0.25, sim)
            expect = oracle_tn_vcsl(
                sim.astype(np.float64), max_step=3, min_length=3,
                max_paths=5, min_sim=params.min_sim,
                top_k=params.top_k_per_row, max_iou=params.max_iou,
            )
            boxes, valid, _ = tn_align(
                jnp.asarray(sim[None]),
                jnp.asarray([nq], jnp.int32),
                jnp.asarray([nr], jnp.int32),
                params,
            )
            got = [
                tuple(map(int, np.asarray(boxes[0][p])))
                for p in range(boxes.shape[1])
                if bool(valid[0][p])
            ]
            assert got == [tuple(map(int, b)) for b in expect], (
                trial, got, expect
            )

    def test_path_masking_keeps_nested_segment(self):
        # A long sparse path whose bounding box contains a short dense
        # one: box masking would consume the inner path's cells; the
        # VCSL-faithful mode must still find it (small box, low IoU).
        nq = nr = 24
        sim = np.zeros((nq, nr), dtype=np.float32)
        # Outer path: steps of 3 along the diagonal (box 0..21 x 0..21).
        for t in range(8):
            sim[3 * t, 3 * t] = 0.9
        # Inner path: inside the outer box but too far off-diagonal for
        # any max_step=3 edge to connect it to the outer path.
        for t in range(4):
            sim[3 * t + 2, 3 * t + 12] = 0.8
        params = TNParams.vcsl_faithful(max_step=3, min_length=4)
        boxes, valid, _ = tn_align(
            jnp.asarray(sim[None]),
            jnp.asarray([nq], jnp.int32),
            jnp.asarray([nr], jnp.int32),
            params,
        )
        got = {
            tuple(map(int, np.asarray(boxes[0][p])))
            for p in range(boxes.shape[1])
            if bool(valid[0][p])
        }
        assert (0, 0, 21, 21) in got
        assert (2, 12, 11, 21) in got

        # Same input under box masking loses the nested path.
        box_params = TNParams(max_step=3, min_length=4, min_sim=0.2,
                              top_k_per_row=5, adaptive_sigma=0.0)
        boxes2, valid2, _ = tn_align(
            jnp.asarray(sim[None]),
            jnp.asarray([nq], jnp.int32),
            jnp.asarray([nr], jnp.int32),
            box_params,
        )
        got_box = {
            tuple(map(int, np.asarray(boxes2[0][p])))
            for p in range(boxes2.shape[1])
            if bool(valid2[0][p])
        }
        assert (2, 12, 11, 21) not in got_box


class TestExactTies:
    """Repeated identical similarities (stills, black frames) produce
    exact (length, simsum) ties; kernel and oracle must pick the same
    predecessor chains and boxes."""

    def test_constant_block_ties_match_oracle(self):
        params = TNParams.vcsl_faithful(max_step=3, min_length=3,
                                        max_paths=4)
        for nq, nr, fill in ((16, 16, 0.8), (20, 14, 0.5)):
            sim = np.zeros((nq, nr), dtype=np.float32)
            sim[2:10, 3:11] = fill  # constant block: everything ties
            expect = oracle_tn_vcsl(
                sim.astype(np.float64), max_step=3, min_length=3,
                max_paths=4, min_sim=params.min_sim,
                top_k=params.top_k_per_row, max_iou=params.max_iou,
            )
            boxes, valid, _ = tn_align(
                jnp.asarray(sim[None]),
                jnp.asarray([nq], jnp.int32),
                jnp.asarray([nr], jnp.int32),
                params,
            )
            got = [
                tuple(map(int, np.asarray(boxes[0][p])))
                for p in range(boxes.shape[1])
                if bool(valid[0][p])
            ]
            assert got == [tuple(map(int, b)) for b in expect], (got, expect)


class TestShardedRefTable:
    """shard_ref_table: the resident ref frame table row-shards over
    the corpus mesh (matching capacity scales with the pod). Every
    similarity element is computed whole on the shard owning its ref
    row and psum'd with exact zeros, so results are BIT-identical to
    the unsharded localizer — including through add/remove."""

    @staticmethod
    def _mesh(n=8):
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        return corpus_mesh(n)

    @staticmethod
    def _key(m):
        return (
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )

    def _ragged_case(self, rng, n_refs=5):
        # Varied video lengths hit several (nq, nr) buckets, and an odd
        # pair count exercises the batch padding to the mesh multiple.
        q = l2n(rng.normal(size=(45, D))).astype(np.float32)
        refs = []
        for i in range(n_refs):
            r = l2n(
                rng.normal(size=(20 + 13 * i, D))
            ).astype(np.float32)
            if i % 2 == 0:  # plant a copy in every other ref
                r[5:15, :] = q[20:30, :]
            refs.append(make_feature(10 + i, r))
        queries = [make_feature(1, q)]
        pairs = [CandidatePair(1, 10 + i, 1.0) for i in range(n_refs)]
        return queries, refs, pairs

    def test_sharded_bitwise_matches_unsharded(self):
        rng = np.random.RandomState(11)
        queries, refs, pairs = self._ragged_case(rng)
        mesh = self._mesh()
        sharded = TNLocalizationMaxSim(
            queries, refs, "TN", similarity_bias=0.5, mesh=mesh,
            shard_ref_table=True,
        )
        plain = TNLocalizationMaxSim(
            queries, refs, "TN", similarity_bias=0.5,
        )
        got = sharded.localize_all(pairs)
        expect = plain.localize_all(pairs)
        assert len(expect) >= 2
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))
        # The table really is distributed (not replicated on one chip).
        assert len(sharded._r_table.sharding.device_set) == 8
        assert not sharded._r_table.sharding.is_fully_replicated
        assert sharded._r_table.shape[0] % 8 == 0
        assert sharded._r_rows is not None

    def test_sharded_add_refs_grows_over_mesh(self):
        rng = np.random.RandomState(13)
        queries, refs, pairs = self._ragged_case(rng, n_refs=3)
        extra = l2n(rng.normal(size=(37, D))).astype(np.float32)
        extra[0:10, :] = queries[0].feature[20:30, :]
        added = [make_feature(99, extra)]
        all_pairs = pairs + [CandidatePair(1, 99, 1.0)]
        mesh = self._mesh()

        grown = TNLocalizationMaxSim(
            queries, refs, "TN", similarity_bias=0.5, mesh=mesh,
            shard_ref_table=True,
        )
        grown.localize_all(pairs[:1])  # stage tables
        grown.add_refs(added)
        assert grown._r_table.shape[0] % 8 == 0
        assert grown._r_rows == 1 + sum(
            vf.feature.shape[0] for vf in refs + added
        )
        got = grown.localize_all(all_pairs)

        fresh = TNLocalizationMaxSim(
            queries, refs + added, "TN", similarity_bias=0.5,
        )
        expect = fresh.localize_all(all_pairs)
        assert any(m.ref_id == 99 for m in expect)
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))

    def test_sharded_remove_refs_compacts_over_mesh(self):
        rng = np.random.RandomState(17)
        queries, refs, pairs = self._ragged_case(rng)
        mesh = self._mesh()

        shrunk = TNLocalizationMaxSim(
            queries, refs, "TN", similarity_bias=0.5, mesh=mesh,
            shard_ref_table=True,
        )
        shrunk.localize_all(pairs)  # stage tables
        drop = [refs[1].video_id, refs[3].video_id]
        shrunk.remove_refs(drop)
        with pytest.raises(KeyError, match="not staged"):
            shrunk.remove_refs([drop[0]])
        survivors = [vf for vf in refs if vf.video_id not in drop]
        assert shrunk._r_rows == 1 + sum(
            vf.feature.shape[0] for vf in survivors
        )
        keep_pairs = [
            p for p in pairs
            if p.ref_id not in drop
        ]
        got = shrunk.localize_all(keep_pairs)

        fresh = TNLocalizationMaxSim(
            queries, survivors, "TN", similarity_bias=0.5,
        )
        expect = fresh.localize_all(keep_pairs)
        assert len(expect) >= 2
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))

    def test_shard_ref_table_requires_mesh(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        with pytest.raises(ValueError, match="requires a mesh"):
            TNLocalizationMaxSim(
                queries, refs, "TN", shard_ref_table=True
            )

    def test_compounded_mutations_fuzz(self):
        # Interleaved add / overwrite-add / remove compose: offsets go
        # non-monotonic (overwrites repoint into appended rows, removes
        # leave dead weight until compaction) — after every round the
        # sharded-table localizer, the unsharded mutated localizer, and
        # a fresh rebuild over the surviving refs must agree exactly.
        rng = np.random.RandomState(41)
        q = l2n(rng.normal(size=(30, D))).astype(np.float32)
        queries = [make_feature(1, q)]

        def new_ref(vid, plant):
            n = int(rng.randint(12, 30))
            r = l2n(rng.normal(size=(n, D))).astype(np.float32)
            if plant:
                r[2:10, :] = q[15:23, :]
            return make_feature(vid, r)

        live = {vid: new_ref(vid, vid % 2 == 0) for vid in range(10, 16)}
        mesh = self._mesh()
        sharded = TNLocalizationMaxSim(
            list(queries), list(live.values()), "TN",
            similarity_bias=0.5, mesh=mesh, shard_ref_table=True,
        )
        plain = TNLocalizationMaxSim(
            list(queries), list(live.values()), "TN",
            similarity_bias=0.5,
        )
        next_vid = 20
        for round_i in range(4):
            # Stage tables before mutating so the device-side
            # grow/compact paths (not a lazy rebuild) are exercised.
            warm = [CandidatePair(1, vid, 1.0) for vid in live][:1]
            sharded.localize_all(warm)
            plain.localize_all(warm)
            adds = []
            for _ in range(int(rng.randint(1, 3))):
                vf_new = new_ref(next_vid, plant=True)
                adds.append(vf_new)
                live[next_vid] = vf_new
                next_vid += 1
            if round_i >= 1:
                # Overwrite an existing id with fresh rows.
                vid = int(rng.choice(sorted(live)))
                vf_new = new_ref(vid, plant=False)
                adds.append(vf_new)
                live[vid] = vf_new
            sharded.add_refs(adds)
            plain.add_refs(adds)
            drop = [
                int(v) for v in rng.choice(
                    sorted(live), size=int(rng.randint(1, 3)),
                    replace=False,
                )
            ]
            for v in drop:
                del live[v]
            sharded.remove_refs(drop)
            plain.remove_refs(drop)

            pairs = [CandidatePair(1, vid, 1.0) for vid in sorted(live)]
            fresh = TNLocalizationMaxSim(
                list(queries), list(live.values()), "TN",
                similarity_bias=0.5,
            )
            expect = sorted(map(self._key, fresh.localize_all(pairs)))
            assert sorted(
                map(self._key, sharded.localize_all(pairs))
            ) == expect, f"sharded diverged at round {round_i}"
            assert sorted(
                map(self._key, plain.localize_all(pairs))
            ) == expect, f"unsharded diverged at round {round_i}"
            assert len(expect) >= 1


class TestBf16RefTables:
    """table_dtype="bfloat16": the resident REF tables store bf16 (2x
    matching capacity per chip); gathered rows upcast to f32 before the
    similarity einsum, so only the stored values round. On features
    whose values are exactly bf16-representable the results must be
    BIT-identical to f32 tables — which pins that nothing but the
    storage dtype changed."""

    @staticmethod
    def _key(m):
        return (
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )

    def _dyadic_case(self, rng, n_refs=4):
        # Entries k/8 with |k| <= 4: exactly representable in bf16, and
        # all similarity dot products are exact dyadics in f32 too.
        def dyadic(shape):
            return (
                rng.randint(-4, 5, size=shape).astype(np.float32) / 8.0
            )

        q = dyadic((30, D))
        refs = []
        for i in range(n_refs):
            r = dyadic((18 + 7 * i, D))
            if i % 2 == 0:
                r[3:13, :] = q[12:22, :]
            refs.append(make_feature(10 + i, r))
        queries = [make_feature(1, q)]
        pairs = [CandidatePair(1, 10 + i, 1.0) for i in range(n_refs)]
        return queries, refs, pairs

    def _build(self, queries, refs, dtype, mesh=None, shard=False):
        kw = {}
        if mesh is not None:
            kw["mesh"] = mesh
            kw["shard_ref_table"] = shard
        return TNLocalizationMaxSim(
            queries, refs, "TN", similarity_bias=0.5,
            table_dtype=dtype, **kw,
        )

    def test_bf16_table_bitwise_on_exact_features(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(43)
        queries, refs, pairs = self._dyadic_case(rng)
        f32 = self._build(queries, refs, "float32")
        bf16 = self._build(queries, refs, "bfloat16")
        expect = f32.localize_all(pairs)
        got = bf16.localize_all(pairs)
        assert len(expect) >= 1
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))
        assert bf16._r_table.dtype == jnp.bfloat16
        assert f32._r_table.dtype == jnp.float32

    def test_bf16_sharded_table_matches_f32(self):
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        rng = np.random.RandomState(47)
        queries, refs, pairs = self._dyadic_case(rng)
        f32 = self._build(queries, refs, "float32")
        bf16 = self._build(
            queries, refs, "bfloat16", mesh=corpus_mesh(8), shard=True
        )
        expect = f32.localize_all(pairs)
        got = bf16.localize_all(pairs)
        assert len(expect) >= 1
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))

    def test_bf16_lifecycle_stays_bf16_and_exact(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(53)
        queries, refs, pairs = self._dyadic_case(rng)
        extra = (
            rng.randint(-4, 5, size=(21, D)).astype(np.float32) / 8.0
        )
        extra[2:12, :] = queries[0].feature[12:22, :]
        added = [make_feature(99, extra)]

        live = self._build(queries, refs, "bfloat16")
        live.localize_all(pairs[:1])  # stage
        live.add_refs(added)
        assert live._r_table.dtype == jnp.bfloat16  # concat must not promote
        live.remove_refs([refs[1].video_id])
        assert live._r_table.dtype == jnp.bfloat16
        final = [
            p for p in pairs if p.ref_id != refs[1].video_id
        ] + [CandidatePair(1, 99, 1.0)]
        got = live.localize_all(final)

        fresh_refs = [r for r in refs if r.video_id != refs[1].video_id]
        fresh = self._build(queries, fresh_refs + added, "bfloat16")
        expect = fresh.localize_all(final)
        assert any(m.ref_id == 99 for m in expect)
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))

    def test_dns_bf16_tables_bitwise_on_exact_features(self):
        import jax.numpy as jnp

        from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
        from vsc2022_tpu.models.dns import NUM_REGIONS

        rng = np.random.RandomState(59)

        def dyadic_fine(n):
            return (
                rng.randint(-4, 5, size=(n, NUM_REGIONS, 16))
                .astype(np.float32) / 8.0
            )

        r_fine = [dyadic_fine(int(rng.randint(20, 32))) for _ in range(4)]
        q_fine = [dyadic_fine(26) for _ in range(2)]
        q_fine[0][6:18] = r_fine[1][4:16]

        def coarse_from(f):
            # Mean over 9 regions is not dyadic; quantize to 1/8 so the
            # coarse features stay bf16-exact too.
            return np.round(f.mean(axis=1) * 8.0) / 8.0

        qf = {f"Q{i:06d}": make_feature(
            f"Q{i:06d}", f.reshape(f.shape[0], -1)
        ) for i, f in enumerate(q_fine)}
        rf = {f"R{i:06d}": make_feature(
            f"R{i:06d}", f.reshape(f.shape[0], -1)
        ) for i, f in enumerate(r_fine)}
        qc = [make_feature(f"Q{i:06d}", coarse_from(f))
              for i, f in enumerate(q_fine)]
        rc = [make_feature(f"R{i:06d}", coarse_from(f))
              for i, f in enumerate(r_fine)]
        cands = [
            CandidatePair(q.video_id, r.video_id, 1.0)
            for q in qc for r in rc
        ]

        def build(dtype):
            return DnSLocalization(
                qf, rf, qc, rc, model_type="TN", similarity_bias=0.5,
                table_dtype=dtype,
            )

        f32 = build("float32")
        bf16 = build("bfloat16")
        expect = f32.localize_all(cands)
        got = bf16.localize_all(cands)
        assert len(expect) >= 1
        assert sorted(map(self._key, got)) == sorted(map(self._key, expect))
        assert bf16._fine_r_tab.dtype == jnp.bfloat16
        assert bf16._r_table.dtype == jnp.bfloat16

    def test_invalid_table_dtype_rejected(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        with pytest.raises(ValueError, match="table_dtype"):
            TNLocalizationMaxSim(
                queries, refs, "TN", table_dtype="float16"
            )


class TestPackedAlign:
    def test_packed_equals_unpacked(self):
        # tn_align_packed is tn_align with one packed D2H buffer; the
        # unpack must reproduce boxes/valid/scores exactly (box frame
        # indices are < 2^24, exact in f32).
        from vsc2022_tpu.ops.tn_align import (
            TNParams,
            tn_align,
            tn_align_packed,
        )

        rng = np.random.RandomState(31)
        sims = rng.rand(5, 40, 48).astype(np.float32)
        sims[1, 10:20, 12:22] += 2.0  # a planted diagonal-ish block
        q_len = np.array([40, 36, 40, 8, 40], np.int32)
        r_len = np.array([48, 44, 10, 48, 48], np.int32)
        for params in (TNParams(), TNParams.vcsl_faithful()):
            boxes, valid, scores = tn_align(
                jnp.asarray(sims), jnp.asarray(q_len),
                jnp.asarray(r_len), params,
            )
            packed = np.asarray(tn_align_packed(
                jnp.asarray(sims), jnp.asarray(q_len),
                jnp.asarray(r_len), params,
            ))
            np.testing.assert_array_equal(
                packed[..., :4].astype(np.int32), np.asarray(boxes)
            )
            np.testing.assert_array_equal(
                packed[..., 4] > 0.5, np.asarray(valid)
            )
            np.testing.assert_array_equal(
                packed[..., 5], np.asarray(scores)
            )
