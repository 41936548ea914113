"""Loop closing: vocabulary-free place recognition, Sim3 verification,
pose-graph correction and global BA.

TPU-native rebuild of the LoopClosing thread (src/LoopClosing.cc:60-680)
and KeyFrameDatabase (src/KeyFrameDatabase.cc):

- Place recognition: instead of the DBoW2 vocabulary tree (a CPU pointer
  walk), every keyframe gets a bag-of-words signature over a *random binary
  codebook* — word assignment is one int8 MXU matmul (argmin hamming
  against W centroids), scoring all keyframes is one [K, W] @ [W] matvec.
  Same inverted-file semantics, dense math.
- Candidate gating mirrors DetectLoop (src/LoopClosing.cc:103-229):
  exclude covisible keyframes, threshold by the lowest covisible-neighbor
  score, and require temporal consistency across consecutive keyframes.
- Geometric verification = solvers/sim3_solver (RANSAC Horn + the 5+10
  OptimizeSim3 schedule) on brute-matched map-point pairs
  (ComputeSim3, src/LoopClosing.cc:231-400).
- Correction = essential-graph Sim3 optimization (solvers/pose_graph) with
  the loop keyframe fixed, point re-anchoring through each point's
  reference keyframe, then global BA (CorrectLoop + RunGlobalBundle-
  Adjustment, src/LoopClosing.cc:402-680).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import SystemConfig
from eao_slam_tpu.geometry import se3, sim3
from eao_slam_tpu.ops import matching
from eao_slam_tpu.solvers.ba import BAProblem, bundle_adjust
from eao_slam_tpu.solvers.pose_graph import PoseGraphProblem, optimize_essential_graph
from eao_slam_tpu.solvers.sim3_solver import (
    optimize_sim3_schedule,
    solve_sim3_ransac,
)

N_WORDS = 32 * 256  # byte-position vocabulary: 32 positions x 256 values


@jax.jit
def kf_signature(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """L2-normalized byte-position histogram of a keyframe's descriptors.

    Each descriptor votes its byte value at each of its 32 byte positions —
    a 8192-word 'vocabulary' whose words are (position, value) pairs. This
    keeps DBoW2's inverted-file semantics but with a quantizer that is
    robust to bit noise (a b-bit flip changes at most b of 32 votes,
    whereas nearest-centroid assignment against random words flips whole
    words on 1-bit changes) and needs no trained tree. Scoring every
    keyframe is one [K, W] @ [W] matvec.
    """
    F = desc.shape[0]
    shifts = jnp.arange(0, 32, 8, dtype=jnp.uint32)
    bytes_ = ((desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF))
    bytes_ = bytes_.reshape(F, 32).astype(jnp.int32)          # [F, 32]
    pos = jnp.arange(32, dtype=jnp.int32)[None, :]
    idx = pos * 256 + bytes_                                  # [F, 32]
    hist = jnp.zeros((N_WORDS,), jnp.float32).at[idx.reshape(-1)].add(
        jnp.repeat(valid.astype(jnp.float32), 32)
    )
    return hist / jnp.maximum(jnp.linalg.norm(hist), 1e-9)


class LoopCloser:
    """Host orchestrator; owns per-keyframe signatures + consistency state."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.cam = cfg.camera
        K = cfg.capacity.max_keyframes
        self.signatures = np.zeros((K, N_WORDS), np.float32)
        self.consistent_streak: dict = {}
        self.last_loop_order = -999  # kf_order index of the last closed loop
        self.closed_loops = 0

    # ------------------------------------------------------------------

    def remap_slots(self, kf_remap: np.ndarray) -> None:
        """Carry detection state through a slot compaction
        (runtime/compaction.py): signatures move to their new slots,
        consistency-streak groups re-key (dropping culled members), and the
        last-loop anchor maps to the nearest surviving predecessor. The
        reference's consistency groups persist for the map's lifetime
        (src/LoopClosing.cc:103-229); resetting here would silently miss
        any loop maturing across a maintenance boundary."""
        K = len(kf_remap)
        kept = kf_remap >= 0
        new_sigs = np.zeros_like(self.signatures)
        new_sigs[kf_remap[kept]] = self.signatures[:K][kept]
        self.signatures = new_sigs
        new_streak: dict = {}
        for group, streak in self.consistent_streak.items():
            g2 = tuple(sorted(
                int(kf_remap[s]) for s in group
                if 0 <= s < K and kf_remap[s] >= 0
            ))
            if g2:
                new_streak[g2] = max(streak, new_streak.get(g2, 0))
        self.consistent_streak = new_streak
        if self.last_loop_order >= 0:
            upto = kf_remap[: self.last_loop_order + 1]
            self.last_loop_order = (
                int(upto.max()) if (upto >= 0).any() else -999
            )

    def on_keyframe(self, tracker, slot: int, signature=None,
                    order=None) -> bool:
        """Run detection (+ correction on success) for a new keyframe.
        Returns True if a loop was closed (map rewritten). `signature`
        lets the chunked path hand in a batch-computed signature (one
        device readback per chunk instead of one per keyframe); `order`
        is the keyframe's insertion order — required when replaying a
        BACKLOG of keyframes against one view (the default, newest-order,
        would mis-evaluate the recency exclusion and the 10-keyframe
        cooldowns for all but the last one)."""
        if signature is None:
            m = tracker.map
            signature = np.asarray(
                kf_signature(m.kf_desc[slot], m.kf_kp_valid[slot])
            )
        self.signatures[slot] = signature
        if order is None:
            order = len(tracker.kf_slots) - 1
        if order - self.last_loop_order < 10 or order < 10:
            return False

        cands = self._detect(tracker, slot, order)
        # verification is the discriminative filter: try every consistent
        # candidate in score order (the reference runs ComputeSim3 over the
        # whole candidate vector too, src/LoopClosing.cc:231-260)
        for cand in cands:
            if self._verify_and_correct(tracker, slot, cand):
                self.last_loop_order = order
                self.closed_loops += 1
                self.consistent_streak.clear()
                return True
        return False

    # ------------------------------------------------------------------

    def _covis_weights(self, tracker, slot: int) -> np.ndarray:
        # chunked path (_LoopView) serves rows from one cached device
        # covis matmul; the per-frame MonoTracker keeps the host loop
        if hasattr(tracker, "covis_weights"):
            return tracker.covis_weights(slot)
        cur = tracker.kf_pt_host[slot]
        cur_set = cur[cur >= 0]
        w = np.zeros((self.cfg.capacity.max_keyframes,), np.int64)
        for s in tracker.kf_slots:
            if s == slot or not tracker.kf_valid_host[s]:
                continue
            other = tracker.kf_pt_host[s]
            w[s] = np.isin(cur_set, other[other >= 0]).sum()
        return w

    def _detect(self, tracker, slot: int, order: int) -> List[int]:
        """DetectLoop: score gate + 3-consecutive-keyframe consistency.
        Uses the BoW vocabulary database when the tracker has one
        (KeyFrameDatabase::DetectLoopCandidates), tf-idf-weighted
        signature scoring otherwise. Returns the consistent candidates in
        score order (possibly several — verification disambiguates)."""
        covis = self._covis_weights(tracker, slot)
        # temporal exclusion relative to THIS keyframe's order: its 8
        # predecessors and everything after it (when replaying a backlog,
        # later keyframes do not exist yet from this keyframe's view)
        recent = set(tracker.kf_slots[max(0, order - 8):])
        scored: list = []       # (score, slot), filtered candidates

        if tracker.kfdb is not None and tracker.vocab is not None:
            from eao_slam_tpu.ops import bow

            q = tracker.kfdb.vectors[slot]
            full_covis = tracker.covis_matrix()
            neigh = np.flatnonzero(covis >= 15)
            if neigh.size:
                nscores = np.asarray(bow.score_l1(
                    tracker.kfdb.vectors[neigh], q))
                min_score = max(float(nscores.min()), 0.05)
            else:
                min_score = 0.15
            cands = tracker.kfdb.detect_loop_candidates(
                q, covis, full_covis, min_score, slot)
            scored = [(1.0 - 1e-3 * i, s) for i, s in enumerate(cands)
                      if s not in recent and tracker.kf_valid_host[s]]
        else:
            # tf-idf weighting (DBoW2's scoring model, src/KeyFrame-
            # Database.cc / DBoW2 TemplatedVocabulary): the raw
            # byte-position histograms share a strong global component
            # (every scene has similar byte statistics), which saturates
            # plain cosine scores; down-weighting ubiquitous words by
            # log(N/df) restores the discriminative margin
            K = self.cfg.capacity.max_keyframes
            docs = [s for s in tracker.kf_slots if tracker.kf_valid_host[s]]
            sigs = self.signatures[:K]
            df = (sigs[docs] > 0).sum(axis=0)
            idf = np.log(max(len(docs), 2) / (1.0 + df))
            idf = np.maximum(idf, 0.0)
            w = sigs * idf[None, :]
            norms = np.linalg.norm(w, axis=1)
            w = w / np.maximum(norms, 1e-9)[:, None]
            scores = w @ w[slot]
            # minimum acceptable score = worst score among covisible neighbors
            neigh = covis >= 15
            min_score = float(scores[neigh].min()) if neigh.any() else 0.3
            min_score = max(min_score, 0.05)

            for s in tracker.kf_slots:
                if s == slot or s in recent or not tracker.kf_valid_host[s]:
                    continue
                if covis[s] > 0:            # connected -> not a loop
                    continue
                if scores[s] >= min_score:
                    scored.append((float(scores[s]), s))
            scored.sort(reverse=True)
            scored = scored[:5]

        if not scored:
            self.consistent_streak.clear()
            return []

        # temporal consistency (the reference's consistency groups): a
        # candidate's covisible neighborhood must intersect a group seen on
        # consecutive keyframes 3 times before verification may run
        new_streaks: dict = {}
        consistent: list = []
        for score, cand in scored:
            cand_covis = self._covis_weights(tracker, cand)
            group = {cand} | {
                s for s in tracker.kf_slots if cand_covis[s] >= 15
            }
            streak = 1
            for prev_group, prev_streak in self.consistent_streak.items():
                if group & set(prev_group):
                    streak = max(streak, prev_streak + 1)
            g = tuple(sorted(group))
            new_streaks[g] = max(streak, new_streaks.get(g, 0))
            if streak >= 3:
                consistent.append(cand)
        self.consistent_streak = new_streaks
        return consistent

    # ------------------------------------------------------------------

    def _verify_and_correct(self, tracker, slot: int, cand: int) -> bool:
        m = tracker.map
        cfg = self.cfg
        P = cfg.capacity.max_points

        # stage 1 — seed hypothesis: brute descriptor match between the two
        # keyframes' mapped features + Sim3 RANSAC. The seed gate is LOWER
        # than the reference's 20 because large mono scale drift (the very
        # thing a loop must fix — measured 9x over a full orbit) shifts
        # pyramid levels and appearance enough that the direct match set is
        # thin; stage 2 grows it back before the real 20-inlier gate.
        pt1 = m.kf_pt_idx[slot]
        pt2 = m.kf_pt_idx[cand]
        q_valid = m.kf_kp_valid[slot] & (pt1 >= 0)
        t_valid = m.kf_kp_valid[cand] & (pt2 >= 0)
        idx, d, ok = matching.search_brute(
            m.kf_desc[slot], q_valid, m.kf_desc[cand], t_valid,
            max_dist=matching.TH_LOW, ratio=0.75,
        )
        n_matches = int(jnp.sum(ok))
        if n_matches < 12:
            return False

        scale2 = jnp.asarray(tracker.scale2_np)
        p1 = jnp.clip(pt1, 0, P - 1)
        p2 = jnp.clip(pt2[idx], 0, P - 1)
        T1 = m.kf_pose[slot]
        T2 = m.kf_pose[cand]
        xc1 = se3.apply(T1, m.pt_pos[p1])
        xc2 = se3.apply(T2, m.pt_pos[p2])
        s2_1 = scale2[jnp.clip(m.kf_octave[slot], 0, 7)]
        s2_2 = scale2[jnp.clip(m.kf_octave[cand], 0, 7)][idx]

        tracker.rng_key, sub = jax.random.split(tracker.rng_key)
        res = solve_sim3_ransac(self.cam, xc1, xc2, ok, s2_1, s2_2, sub,
                                n_hyp=512, min_inliers=8)
        if not bool(res.success):
            return False

        # stage 2 — SearchBySim3 (src/ORBmatcher.cc:1155 role): project the
        # candidate's map points into the current keyframe under the seed
        # Sim3 and grow the correspondence set by windowed descriptor NN;
        # then the full 5+10 Sim3 optimization with the reference's
        # 20-inlier acceptance gate
        g_idx, g_ok = self._search_by_sim3(m, slot, cand, res.S12)
        p1g = pt1[g_idx]                       # slot-side point per cand j
        pair_ok = g_ok & (pt2 >= 0) & (p1g >= 0)
        if int(jnp.sum(pair_ok)) < 20:
            return False
        xc1g = se3.apply(T1, m.pt_pos[jnp.clip(p1g, 0, P - 1)])
        xc2g = se3.apply(T2, m.pt_pos[jnp.clip(pt2, 0, P - 1)])
        s2_1g = scale2[jnp.clip(m.kf_octave[slot], 0, 7)][g_idx]
        s2_2g = scale2[jnp.clip(m.kf_octave[cand], 0, 7)]
        res = optimize_sim3_schedule(
            self.cam, res.S12, xc1g, xc2g, pair_ok,
            1.0 / s2_1g, 1.0 / s2_2g,
        )
        if int(res.n_inliers) < 20:
            return False

        self._correct_loop(tracker, slot, cand, res.S12)
        self._fuse_loop_points(tracker, jnp.clip(p1g, 0, P - 1),
                               jnp.clip(pt2, 0, P - 1),
                               pair_ok & res.inliers)
        if hasattr(tracker, "invalidate_covis"):
            tracker.invalidate_covis()  # fusion rewired observations
        # global BA over the fused, corrected map straightens the interior
        # of the chain (RunGlobalBundleAdjustment, src/LoopClosing.cc:642)
        self._global_ba(tracker, fixed_slot=cand)
        tracker.last_T = np.asarray(tracker.map.kf_pose)[tracker.kf_slots[-1]]
        tracker.velocity = None
        tracker.last_pt = jnp.asarray(tracker.kf_pt_host[tracker.kf_slots[-1]])
        return True

    def _search_by_sim3(self, m, slot: int, cand: int, S12):
        """Grow loop correspondences under a seed Sim3: candidate map
        points project into the current keyframe through S12 and match
        current mapped features by windowed descriptor NN (SearchBySim3,
        src/ORBmatcher.cc:1155-1280). No octave gate — Sim3 closure exists
        BECAUSE scale drifted, which shifts pyramid levels arbitrarily.
        Returns (idx [F] slot-feature per cand-feature, ok [F])."""
        from eao_slam_tpu.geometry.camera import project

        P = m.pt_pos.shape[0]
        pt1 = m.kf_pt_idx[slot]
        pt2 = m.kf_pt_idx[cand]
        X2c = se3.apply(m.kf_pose[cand], m.pt_pos[jnp.clip(pt2, 0, P - 1)])
        X_in1 = sim3.apply(S12, X2c)
        uv = project(self.cam, X_in1)
        q_valid = m.kf_kp_valid[cand] & (pt2 >= 0) & (X_in1[:, 2] > 0.05)
        t_valid = m.kf_kp_valid[slot] & (pt1 >= 0)
        dist = matching.hamming_matrix(m.kf_desc[cand], m.kf_desc[slot])
        mask = matching.window_mask(uv, m.kf_kp[slot],
                                    jnp.float32(15.0), q_valid, t_valid)
        idx, d, ok = matching.match_nn(dist, mask,
                                       max_dist=matching.TH_HIGH, ratio=0.9)
        ok = matching.resolve_duplicate_cols(idx, d, ok, pt1.shape[0])
        return idx, ok

    def _fuse_loop_points(self, tracker, p1, p2, inlier):
        """Replace the current side's duplicated points with the loop side's
        (SearchAndFuse, src/LoopClosing.cc:584-640, restricted to the
        verified Sim3 inlier matches): every keyframe observation of p1
        now references p2, and p1 dies."""
        m = tracker.map
        P = m.pt_pos.shape[0]
        src = jnp.where(inlier, p1, P)          # dup points (current side)
        dst = jnp.where(inlier, p2, P)
        remap = jnp.arange(P + 1, dtype=jnp.int32).at[src].set(dst, mode="drop")
        remap = remap[:P]

        kf_pt = m.kf_pt_idx
        live = kf_pt >= 0
        kf_pt = jnp.where(live, remap[jnp.clip(kf_pt, 0, P - 1)], kf_pt)
        pt_valid = m.pt_valid.at[src].set(False, mode="drop")
        tracker.map = m._replace(kf_pt_idx=kf_pt, pt_valid=pt_valid)
        # np.array (copy): np.asarray of a jax array is a READ-ONLY view,
        # and _apply_ba writes these mirrors in place
        tracker.kf_pt_host = np.array(np.asarray(tracker.map.kf_pt_idx))
        tracker.pt_valid_host = np.array(np.asarray(pt_valid))

    def _correct_loop(self, tracker, slot: int, cand: int, S12):
        """CorrectLoop: essential-graph optimization + point re-anchoring +
        global BA (src/LoopClosing.cc:402-582)."""
        m = tracker.map
        cfg = self.cfg
        K = cfg.capacity.max_keyframes
        slots = [s for s in tracker.kf_slots if tracker.kf_valid_host[s]]
        order_of = {s: i for i, s in enumerate(tracker.kf_slots)}

        poses_old = np.asarray(m.kf_pose)
        verts = np.zeros((K, 8), np.float32)
        verts[:, 0] = 1.0
        for s in slots:
            verts[s] = np.asarray(sim3.from_se3(jnp.asarray(poses_old[s])))

        # edges: temporal chain + strong covisibility + the loop edge
        ei, ej, meas, wts = [], [], [], []

        def add_edge(i, j, Sm, w=1.0):
            ei.append(i)
            ej.append(j)
            meas.append(Sm)
            wts.append(w)

        Sv = jnp.asarray(verts)
        for a, b in zip(tracker.kf_slots[:-1], tracker.kf_slots[1:]):
            if tracker.kf_valid_host[a] and tracker.kf_valid_host[b]:
                add_edge(a, b, sim3.compose(Sv[b], sim3.inverse(Sv[a])))
        # covisibility edges (weight >= 30 shared points, mirroring the
        # reference's >= 100-weight gate scaled to our feature budget)
        for i_idx, a in enumerate(slots):
            covis = self._covis_weights(tracker, a)
            for b in slots[i_idx + 1:]:
                if covis[b] >= 30 and abs(order_of[a] - order_of[b]) > 1:
                    add_edge(a, b, sim3.compose(Sv[b], sim3.inverse(Sv[a])))
        # loop edge: S_slot = S12 * S_cand  =>  meas S_{slot,cand} = S12
        add_edge(cand, slot, jnp.asarray(S12), w=5.0)

        E = len(ei)
        v_fixed = np.zeros((K,), bool)
        v_fixed[cand] = True
        v_valid = np.zeros((K,), bool)
        v_valid[slots] = True

        prob = PoseGraphProblem(
            vertices=jnp.asarray(verts),
            v_fixed=jnp.asarray(v_fixed),
            v_valid=jnp.asarray(v_valid),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_meas=jnp.stack(meas),
            edge_valid=jnp.ones((E,), bool),
            edge_weight=jnp.asarray(wts, jnp.float32),
        )
        new_verts, cost = optimize_essential_graph(prob, iters=20)

        # re-anchor points through their reference keyframe:
        # X' = S_new^-1 ( S_old (X) )
        S_old = jnp.asarray(verts)
        ref_kf = jnp.clip(m.pt_first_kf, 0, K - 1)
        S_o = S_old[ref_kf]
        S_n = new_verts[ref_kf]
        X_corr = sim3.apply(
            jax.vmap(sim3.inverse)(S_n), sim3.apply(S_o, m.pt_pos)
        )
        X_corr = jnp.where((m.pt_valid & (m.pt_first_kf >= 0))[:, None], X_corr, m.pt_pos)

        new_poses = jax.vmap(sim3.to_se3)(new_verts)
        keep = ~jnp.asarray(v_valid)
        kf_pose = jnp.where(keep[:, None, None], m.kf_pose, new_poses)
        tracker.map = m._replace(kf_pose=kf_pose, pt_pos=X_corr)

    def _global_ba(self, tracker, fixed_slot: int):
        from eao_slam_tpu.runtime.local_mapping import run_local_ba

        slots = [s for s in tracker.kf_slots if tracker.kf_valid_host[s]]
        # the loop-time GBA is global: give it the full point capacity,
        # not the windowed-BA budget — straightening the whole chain with
        # only a quarter of the map free leaves the interior bent
        # (RunGlobalBundleAdjustment optimizes every map point,
        # src/LoopClosing.cc:642, src/Optimizer.cc:45-120)
        ba = run_local_ba(
            tracker.cam, tracker.map, slots, [fixed_slot],
            tracker.scale2_np,
            max(self.cfg.capacity.local_ba_points,
                self.cfg.capacity.max_points),
            solver=getattr(tracker, "ba_solver", None),
        )
        tracker._apply_ba(ba)
