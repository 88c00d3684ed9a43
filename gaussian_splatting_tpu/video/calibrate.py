"""Camera calibration and pairwise feature matching.

Mirrors the reference ``calibrate.py`` behaviors:
- intrinsics: explicit focal override, 35mm-equivalent conversion
  ``(f35/36)*max(W,H)``, or the COLMAP-style prior ``1.2*max(W,H)``
  (reference ``calibrate.py:333-382``, ``README.md:7``);
- SIFT (default, ``nfeatures=4000, contrastThreshold=0.005,
  edgeThreshold=20`` — reference ``calibrate.py:54``) or ORB matching with
  Lowe ratio test 0.75 (``calibrate.py:85-125``);
- intrinsics validation via Sampson distance on fundamental-matrix inliers
  (``calibrate.py:285-331``).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

log = logging.getLogger(__name__)


class Calibrator:
    def __init__(self, matcher: str = "sift", focal_px: Optional[float] = None,
                 focal_35mm: Optional[float] = None, nfeatures: int = 4000):
        self.matcher_kind = matcher
        self.focal_px = focal_px
        self.focal_35mm = focal_35mm
        if matcher == "sift":
            self.detector = cv2.SIFT.create(
                nfeatures=nfeatures, contrastThreshold=0.005, edgeThreshold=20
            )
            self.bf = cv2.BFMatcher(cv2.NORM_L2)
        elif matcher in ("orb", "opencv"):
            self.detector = cv2.ORB.create(nfeatures=nfeatures)
            self.bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        else:
            raise ValueError(f"unknown matcher {matcher!r} (sift | orb)")
        self._feat_cache: Dict[int, tuple] = {}

    # ---- features / matches ---------------------------------------------

    def detect(self, frame: np.ndarray, cache_key: Optional[int] = None):
        if cache_key is not None and cache_key in self._feat_cache:
            return self._feat_cache[cache_key]
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        kps, desc = self.detector.detectAndCompute(gray, None)
        out = (kps, desc)
        if cache_key is not None:
            self._feat_cache[cache_key] = out
        return out

    def match_pair(self, frame1, frame2, key1=None, key2=None,
                   ratio: float = 0.75) -> Tuple[np.ndarray, np.ndarray]:
        """Lowe-ratio-tested matches. Returns (pts1 (M,2), pts2 (M,2))."""
        kps1, d1 = self.detect(frame1, key1)
        kps2, d2 = self.detect(frame2, key2)
        if d1 is None or d2 is None or len(kps1) < 2 or len(kps2) < 2:
            return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)
        knn = self.bf.knnMatch(d1, d2, k=2)
        pts1, pts2 = [], []
        for pair in knn:
            if len(pair) < 2:
                continue
            m, n = pair
            if m.distance < ratio * n.distance:
                pts1.append(kps1[m.queryIdx].pt)
                pts2.append(kps2[m.trainIdx].pt)
        if not pts1:
            return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)
        return np.asarray(pts1, np.float32), np.asarray(pts2, np.float32)

    # ---- intrinsics ------------------------------------------------------

    def identify_intrinsics(self, width: int, height: int,
                            sample_frames: Optional[List[np.ndarray]] = None) -> np.ndarray:
        """Focal prior + optional Sampson-distance validation on sample frames
        (reference ``calibrate.py:333-382``)."""
        m = float(max(width, height))
        if self.focal_px is not None:
            f = float(self.focal_px)
        elif self.focal_35mm is not None:
            f = (float(self.focal_35mm) / 36.0) * m
        else:
            f = 1.2 * m
        K = np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]], np.float64)
        if sample_frames and len(sample_frames) >= 2:
            err = self.validate_intrinsics(K, sample_frames)
            if err is not None:
                log.info("intrinsics Sampson check: %.3f px (focal %.1f)", err, f)
        return K

    def validate_intrinsics(self, K: np.ndarray, frames: List[np.ndarray]) -> Optional[float]:
        """Median Sampson distance of F-inlier matches on consecutive sample
        pairs (reference ``calibrate.py:285-331``). Returns None if not enough
        matches anywhere."""
        errs = []
        for a, b in zip(frames[:-1], frames[1:]):
            p1, p2 = self.match_pair(a, b)
            if len(p1) < 16:
                continue
            F, mask = cv2.findFundamentalMat(p1, p2, cv2.FM_RANSAC, 1.0, 0.999)
            if F is None:
                continue
            inl = mask.ravel().astype(bool)
            if inl.sum() < 8:
                continue
            x1 = np.hstack([p1[inl], np.ones((inl.sum(), 1))])
            x2 = np.hstack([p2[inl], np.ones((inl.sum(), 1))])
            Fx1 = x1 @ F.T
            Ftx2 = x2 @ F
            num = np.sum(x2 * Fx1, axis=1) ** 2
            den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
            errs.append(float(np.median(num / np.maximum(den, 1e-12))))
        return float(np.median(errs)) if errs else None
