"""Keyframe recognition database over BoW vectors.

TPU-native rebuild of KeyFrameDatabase (src/KeyFrameDatabase.cc,
include/KeyFrameDatabase.h): the inverted index word->keyframes becomes a
dense [K, W] matrix of L1-normalized tf-idf vectors, so

- the shared-word count of a query against *all* keyframes is one boolean
  matvec (KeyFrameDatabase::DetectLoopCandidates word loop, :75-117),
- L1 similarity against all keyframes is one [K, W] @ abs-diff reduction,
- the covisibility-group score accumulation (:137-170) is a masked
  matmul over the covisibility weight matrix.

Candidate filtering follows the reference:
  loop:  common words > 0.8 * max_common, score >= min_score, group
         accumulated score > 0.75 * best_acc (DetectLoopCandidates).
  reloc: common words > 0.8 * max_common, group accumulation, keep
         candidates with acc > 0.75 * best_acc
         (DetectRelocalizationCandidates, :198-310).
"""

from __future__ import annotations

from typing import List

import numpy as np

from eao_slam_tpu.ops import bow


class KeyFrameDatabase:
    """Host-owned dense store; scoring runs as jitted array ops."""

    def __init__(self, voc: bow.Vocabulary, max_keyframes: int):
        self.voc = voc
        self.K = max_keyframes
        self.vectors = np.zeros((max_keyframes, voc.n_words), np.float32)
        self.present = np.zeros((max_keyframes,), bool)

    # -- mirror add/erase/clear (src/KeyFrameDatabase.cc:37-71) ------------

    def add(self, slot: int, vec) -> None:
        self.vectors[slot] = np.asarray(vec)
        self.present[slot] = True

    def erase(self, slot: int) -> None:
        self.present[slot] = False
        self.vectors[slot] = 0.0

    def clear(self) -> None:
        self.present[:] = False
        self.vectors[:] = 0.0

    # -----------------------------------------------------------------

    def _scores(self, q: np.ndarray):
        scores = np.array(bow.score_l1(self.vectors, q))
        common = np.array(bow.common_words(self.vectors > 0, q))
        scores[~self.present] = -1.0
        common[~self.present] = 0
        return scores, common

    def _group_accumulate(self, base: np.ndarray, cand_mask: np.ndarray,
                          covis: np.ndarray, top: int = 10):
        """For each candidate, sum scores over its top covisible neighbors
        that are themselves candidates; track the group's best member
        (the reference's accScore/bestScore per group, :137-170 / :262-300).
        covis: [K, K] shared-observation weights.
        Returns (acc [K], best_member [K])."""
        acc = np.where(cand_mask, base, 0.0).copy()
        best_member = np.arange(self.K)
        for i in np.flatnonzero(cand_mask):
            nb = np.argsort(-covis[i])[:top]
            nb = nb[(covis[i][nb] > 0) & cand_mask[nb]]
            if nb.size:
                acc[i] = base[i] + base[nb].sum()
                grp = np.concatenate([[i], nb])
                best_member[i] = grp[np.argmax(base[grp])]
        return acc, best_member

    def detect_loop_candidates(self, q: np.ndarray, covis_row: np.ndarray,
                               covis: np.ndarray, min_score: float,
                               self_slot: int) -> List[int]:
        """DetectLoopCandidates (src/KeyFrameDatabase.cc:75-196).
        covis_row: query's covisibility weights [K] (connected keyframes are
        excluded from candidacy); covis: full [K, K] weight matrix."""
        scores, common = self._scores(q)
        eligible = self.present & (covis_row <= 0)
        eligible[self_slot] = False
        if not eligible.any():
            return []
        max_common = common[eligible].max()
        if max_common == 0:
            return []
        cand = eligible & (common > 0.8 * max_common) & (scores >= min_score)
        if not cand.any():
            return []
        acc, best_member = self._group_accumulate(scores, cand, covis)
        best_acc = acc[cand].max()
        keep = cand & (acc > 0.75 * best_acc)
        # return each surviving group's best member, deduplicated, by score
        members = np.unique(best_member[keep])
        return sorted(members.tolist(), key=lambda s: -scores[s])

    def detect_reloc_candidates(self, q: np.ndarray,
                                covis: np.ndarray) -> List[int]:
        """DetectRelocalizationCandidates (src/KeyFrameDatabase.cc:198-310):
        no covisibility exclusion and no absolute min score."""
        scores, common = self._scores(q)
        if not self.present.any():
            return []
        max_common = common[self.present].max()
        if max_common == 0:
            return []
        cand = self.present & (common > 0.8 * max_common)
        if not cand.any():
            return []
        acc, best_member = self._group_accumulate(scores, cand, covis)
        best_acc = acc[cand].max()
        keep = cand & (acc > 0.75 * best_acc)
        members = np.unique(best_member[keep])
        return sorted(members.tolist(), key=lambda s: -scores[s])
