"""Dense optical flow for the cross-consistency term.

The reference computes Farneback flow from each reference image to its
best neighbor during InitViews (ref: frame_main/libs/MVS/SceneDensify.cpp:
404-508, cv::calcOpticalFlowFarneback at :470) and scores PatchMatch
hypotheses against it (score_flow, dense/score.py flow_score).  Flow is a
host-side preprocessing step here exactly as in the reference (OpenCV);
the consumption is on device.
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np


def farneback_flow(ref_gray: np.ndarray, nbr_gray: np.ndarray,
                   pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3) -> np.ndarray:
    """(2, H, W) planes-first flow ref -> neighbor (u, v)."""
    a = np.clip(ref_gray * 255, 0, 255).astype(np.uint8)
    b = np.clip(nbr_gray * 255, 0, 255).astype(np.uint8)
    flow = cv2.calcOpticalFlowFarneback(
        a, b, None, pyr_scale, levels, winsize, iterations, 5, 1.2, 0)
    return np.moveaxis(flow, -1, 0).astype(np.float32)


def scene_flows(grays: np.ndarray, nbr_idx: np.ndarray) -> np.ndarray:
    """(N, 2, H, W) flow from each view to its best (first) neighbor —
    the flow_images analog (ref: DepthData.flow_images, DepthMap.h:242)."""
    n = len(grays)
    flows = np.zeros((n, 2) + grays[0].shape, np.float32)
    for i in range(n):
        j = int(nbr_idx[i, 0])
        flows[i] = farneback_flow(grays[i], grays[j])
    return flows
