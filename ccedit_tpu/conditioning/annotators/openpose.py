"""OpenPose body-pose annotator — TPU-native CNN + host-side assembly.

Reference: ``OpenposeEncoder`` + ``HackedBody``
(sgm/modules/encoders/modules.py:1878-2297).  The CNN is the classic CMU CPM
2-branch VGG (``bodypose_model`` from the vendored controlnet11 openpose
port): a VGG-19-style trunk, then 6 refinement stages, each predicting 38
part-affinity-field channels (branch L1) and 19 keypoint heatmap channels
(branch L2), every stage re-consuming [L1, L2, trunk] concatenated.

Split of labor (matches the reference's own split):
  * heatmap/PAF inference — flax, channels-last, jit-able, runs on the MXU;
  * peak finding, greedy PAF limb matching, person-subset merging, and canvas
    drawing — host numpy/cv2 (data-dependent shapes, trivially cheap).

One deliberate divergence: the reference's torch rewrite of the heatmap
smoothing (``apply_gaussian_filter``, modules.py:1866-1876) degenerates to a
1-D vertical blur and PADS THE WIDTH by 4 px (kernel (1,1,9,1) with padding
(4,4)), shifting every peak's x coordinate.  We implement the semantics that
code was porting — the original openpose ``gaussian_filter(map, sigma=3)``
2-D blur — not the port's bug.

Encoder contract (modules.py:1912-2001): (B,T,H,W,3) in [-1,1] -> per-frame
pose canvases, inverted, in [-1,1].
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels, kernel, pool_before) per trunk layer; VGG19-CPM trunk
_TRUNK: Sequence[Tuple[str, int, int, bool]] = (
    ("conv1_1", 64, 3, False), ("conv1_2", 64, 3, False),
    ("conv2_1", 128, 3, True), ("conv2_2", 128, 3, False),
    ("conv3_1", 256, 3, True), ("conv3_2", 256, 3, False),
    ("conv3_3", 256, 3, False), ("conv3_4", 256, 3, False),
    ("conv4_1", 512, 3, True), ("conv4_2", 512, 3, False),
    ("conv4_3_CPM", 256, 3, False), ("conv4_4_CPM", 128, 3, False),
)


class BodyPoseModel(nn.Module):
    """CPM body model: input (N,H,W,3) (preprocessed /256-0.5), output
    (paf (N,h,w,38), heatmap (N,h,w,19)) at stride 8."""

    @nn.compact
    def __call__(self, x):
        for name, ch, k, pool in _TRUNK:
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(ch, (k, k), padding=k // 2, name=name)(x))
        trunk = x

        def stage1(branch: str, out_ch: int):
            y = trunk
            for i in range(1, 4):
                y = nn.relu(nn.Conv(128, (3, 3), padding=1,
                                    name=f"conv5_{i}_CPM_{branch}")(y))
            y = nn.relu(nn.Conv(512, (1, 1), name=f"conv5_4_CPM_{branch}")(y))
            return nn.Conv(out_ch, (1, 1), name=f"conv5_5_CPM_{branch}")(y)

        paf, heat = stage1("L1", 38), stage1("L2", 19)

        for s in range(2, 7):
            inp = jnp.concatenate([paf, heat, trunk], axis=-1)  # 185 ch

            def refine(branch: str, out_ch: int, inp=inp, s=s):
                y = inp
                for i in range(1, 6):
                    y = nn.relu(nn.Conv(128, (7, 7), padding=3,
                                        name=f"Mconv{i}_stage{s}_{branch}")(y))
                y = nn.relu(nn.Conv(128, (1, 1),
                                    name=f"Mconv6_stage{s}_{branch}")(y))
                return nn.Conv(out_ch, (1, 1),
                               name=f"Mconv7_stage{s}_{branch}")(y)

            paf, heat = refine("L1", 38), refine("L2", 19)
        return paf, heat


def convert_bodypose(sd: Dict[str, np.ndarray]) -> Dict:
    """body_pose_model.pth -> flax params.  Accepts both raw checkpoint keys
    (``conv1_1.weight``) and module-prefixed ones (``model0.conv1_1.weight``,
    the post-``transfer`` layout of modules.py:2010)."""
    flat = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0].startswith("model"):
            parts = parts[1:]
        flat[".".join(parts)] = np.asarray(v, np.float32)
    params = {}
    for k in {kk.rsplit(".", 1)[0] for kk in flat}:
        params[k] = {
            "kernel": jnp.asarray(np.transpose(flat[f"{k}.weight"], (2, 3, 1, 0))),
            "bias": jnp.asarray(flat[f"{k}.bias"]),
        }
    return params


# ---------------------------------------------------------------------------
# host-side assembly (modules.py:2024-2297, original openpose semantics)
# ---------------------------------------------------------------------------

LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]
MAP_IDX = [[31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44],
           [19, 20], [21, 22], [23, 24], [25, 26], [27, 28], [29, 30],
           [47, 48], [49, 50], [53, 54], [51, 52], [55, 56], [37, 38],
           [45, 46]]
_COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
           [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
           [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
           [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
           [255, 0, 170], [255, 0, 85]]


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1):
    """Per-part peak extraction (modules.py:2090-2120): 2-D gaussian smooth
    (sigma 3), 4-neighbor local maxima above thre1.  heatmap: (H,W,19).
    Returns list of 18 lists of (x, y, score, id)."""
    from scipy.ndimage import gaussian_filter

    all_peaks: List[List[Tuple]] = []
    counter = 0
    for part in range(18):
        map_ori = heatmap[:, :, part]
        smoothed = gaussian_filter(map_ori, sigma=3)
        left = np.zeros_like(smoothed); left[1:, :] = smoothed[:-1, :]
        right = np.zeros_like(smoothed); right[:-1, :] = smoothed[1:, :]
        up = np.zeros_like(smoothed); up[:, 1:] = smoothed[:, :-1]
        down = np.zeros_like(smoothed); down[:, :-1] = smoothed[:, 1:]
        binary = ((smoothed >= left) & (smoothed >= right) & (smoothed >= up)
                  & (smoothed >= down) & (smoothed > thre1))
        ys, xs = np.nonzero(binary)
        peaks = [(int(x), int(y), float(map_ori[y, x]), counter + i)
                 for i, (y, x) in enumerate(zip(ys, xs))]
        counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def assemble_limbs(all_peaks, paf: np.ndarray, img_h: int,
                   thre2: float = 0.05, mid_num: int = 10):
    """Greedy PAF limb matching (modules.py:2143-2237).  paf: (H,W,38)."""
    connection_all, special_k = [], []
    for k in range(len(MAP_IDX)):
        score_mid = paf[:, :, [x - 19 for x in MAP_IDX[k]]]
        candA = all_peaks[LIMB_SEQ[k][0] - 1]
        candB = all_peaks[LIMB_SEQ[k][1] - 1]
        if not candA or not candB:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, a in enumerate(candA):
            for j, b in enumerate(candB):
                vec = np.asarray(b[:2], np.float64) - np.asarray(a[:2], np.float64)
                norm = max(0.001, math.hypot(vec[0], vec[1]))
                vec = vec / norm
                xs = np.linspace(a[0], b[0], mid_num)
                ys = np.linspace(a[1], b[1], mid_num)
                vx = np.array([score_mid[int(round(ys[t])), int(round(xs[t])), 0]
                               for t in range(mid_num)])
                vy = np.array([score_mid[int(round(ys[t])), int(round(xs[t])), 1]
                               for t in range(mid_num)])
                score_mid_pts = vx * vec[0] + vy * vec[1]
                score_prior = (score_mid_pts.mean()
                               + min(0.5 * img_h / norm - 1, 0))
                if ((score_mid_pts > thre2).sum() > 0.8 * mid_num
                        and score_prior > 0):
                    candidates.append([i, j, score_prior,
                                       score_prior + a[2] + b[2]])
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = np.zeros((0, 5))
        for i, j, s, _ in candidates:
            if i not in connection[:, 3] and j not in connection[:, 4]:
                connection = np.vstack(
                    [connection, [candA[i][3], candB[j][3], s, i, j]])
                if len(connection) >= min(len(candA), len(candB)):
                    break
        connection_all.append(connection)
    return connection_all, special_k


def merge_subsets(all_peaks, connection_all, special_k):
    """Person grouping (modules.py:2242-2297).  Returns (candidate, subset):
    candidate (n,4) = x,y,score,id; subset (m,20) = 18 part ids + score + count."""
    subset = -1 * np.ones((0, 20))
    candidate = np.array(
        [item for sublist in all_peaks for item in sublist], dtype=np.float64)
    if candidate.size == 0:
        candidate = candidate.reshape(0, 4)
    for k in range(len(MAP_IDX)):
        if k in special_k:
            continue
        partAs = connection_all[k][:, 0]
        partBs = connection_all[k][:, 1]
        indexA, indexB = np.array(LIMB_SEQ[k]) - 1
        for i in range(len(connection_all[k])):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][indexA] == partAs[i] or subset[j][indexB] == partBs[i]:
                    if found < 2:
                        subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][indexB] != partBs[i]:
                    subset[j][indexB] = partBs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[int(partBs[i]), 2]
                                      + connection_all[k][i][2])
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if (membership == 2).sum() == 0:  # disjoint -> merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][indexB] = partBs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[int(partBs[i]), 2]
                                      + connection_all[k][i][2])
            elif not found and k < 17:
                row = -1 * np.ones(20)
                row[indexA] = partAs[i]
                row[indexB] = partBs[i]
                row[-1] = 2
                row[-2] = (candidate[connection_all[k][i, :2].astype(int), 2].sum()
                           + connection_all[k][i][2])
                subset = np.vstack([subset, row])
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(canvas: np.ndarray, candidate, subset) -> np.ndarray:
    """Render limbs (ellipses) + joints (circles); candidate x/y normalized to
    [0,1] (controlnet11 openpose util.draw_bodypose)."""
    import cv2

    H, W = canvas.shape[:2]
    candidate = np.asarray(candidate)
    stickwidth = 4
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.array(LIMB_SEQ[i]) - 1]
            if -1 in index:
                continue
            Y = candidate[index.astype(int), 0] * float(W)
            X = candidate[index.astype(int), 1] * float(H)
            mX, mY = X.mean(), Y.mean()
            length = math.hypot(X[0] - X[1], Y[0] - Y[1])
            angle = math.degrees(math.atan2(X[0] - X[1], Y[0] - Y[1]))
            polygon = cv2.ellipse2Poly(
                (int(mY), int(mX)), (int(length / 2), stickwidth), int(angle),
                0, 360, 1)
            cv2.fillConvexPoly(canvas, polygon, _COLORS[i])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            cv2.circle(canvas, (int(x * W), int(y * H)), 4, _COLORS[i],
                       thickness=-1)
    return canvas


def draw_handpose(canvas: np.ndarray, all_hand_peaks) -> np.ndarray:
    """21-keypoint hand skeleton (controlnet11 openpose util.draw_handpose)."""
    import cv2

    edges = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
             [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
             [15, 16], [0, 17], [17, 18], [18, 19], [19, 20]]
    H, W = canvas.shape[:2]
    for peaks in all_hand_peaks:
        peaks = np.asarray(peaks)
        for ie, e in enumerate(edges):
            x1, y1 = peaks[e[0]]
            x2, y2 = peaks[e[1]]
            if min(x1, y1, x2, y2) > 0:
                import matplotlib

                rgb = matplotlib.colors.hsv_to_rgb(
                    [ie / float(len(edges)), 1.0, 1.0]) * 255
                cv2.line(canvas, (int(x1 * W), int(y1 * H)),
                         (int(x2 * W), int(y2 * H)), rgb.astype(int).tolist(),
                         thickness=2)
        for x, y in peaks:
            if x > 0 and y > 0:
                cv2.circle(canvas, (int(x * W), int(y * H)), 4, (0, 0, 255),
                           thickness=-1)
    return canvas


def draw_facepose(canvas: np.ndarray, all_face_peaks) -> np.ndarray:
    import cv2

    H, W = canvas.shape[:2]
    for peaks in all_face_peaks:
        for x, y in np.asarray(peaks):
            if x > 0 and y > 0:
                cv2.circle(canvas, (int(x * W), int(y * H)), 3,
                           (255, 255, 255), thickness=-1)
    return canvas


def _pad_to_stride(img: np.ndarray, stride: int, value: float):
    h, w = img.shape[:2]
    pad_d = (stride - h % stride) % stride
    pad_r = (stride - w % stride) % stride
    out = np.pad(img, ((0, pad_d), (0, pad_r), (0, 0)), constant_values=value)
    return out, (pad_d, pad_r)


class BodyEstimator:
    """Single-scale body estimation (HackedBody, modules.py:2007-2297 with
    scale_search=[0.5], boxsize 368, stride 8, padValue 128)."""

    def __init__(self, params, model: BodyPoseModel | None = None):
        self.params = params
        self.model = model or BodyPoseModel()
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, frame_rgb255: np.ndarray):
        """frame_rgb255: (H,W,3) float 0..255 (BGR-flipped upstream, as the
        encoder does).  Returns (candidate, subset) with x/y in pixels."""
        import cv2

        H, W = frame_rgb255.shape[:2]
        scale = 0.5 * 368.0 / H
        resized = cv2.resize(frame_rgb255.astype(np.float32), None, fx=scale,
                             fy=scale, interpolation=cv2.INTER_AREA
                             if scale < 1 else cv2.INTER_CUBIC)
        padded, _pad = _pad_to_stride(resized, 8, 128.0)
        inp = padded[None] / 256.0 - 0.5
        paf, heat = self._apply(self.params, jnp.asarray(inp, jnp.float32))
        paf = np.asarray(paf[0], np.float32)
        heat = np.asarray(heat[0], np.float32)
        # upsample x8, crop padding, resize to original frame
        ph, pw = padded.shape[:2]
        heat = cv2.resize(heat, (pw, ph), interpolation=cv2.INTER_LINEAR)
        paf = cv2.resize(paf, (pw, ph), interpolation=cv2.INTER_LINEAR)
        heat = cv2.resize(heat[:resized.shape[0], :resized.shape[1]], (W, H),
                          interpolation=cv2.INTER_LINEAR)
        paf = cv2.resize(paf[:resized.shape[0], :resized.shape[1]], (W, H),
                         interpolation=cv2.INTER_LINEAR)

        all_peaks = find_peaks(heat)
        connection_all, special_k = assemble_limbs(all_peaks, paf, H)
        return merge_subsets(all_peaks, connection_all, special_k)


def detect_openpose(params, frames: np.ndarray,
                    estimator: BodyEstimator | None = None) -> np.ndarray:
    """frames: (N,H,W,3) RGB in [-1,1].  Returns inverted pose canvases
    (N,H,W,3) in [-1,1] (modules.py:1986-2001: /255 -> 1-x -> *2-1)."""
    est = estimator or BodyEstimator(params)
    n, H, W = frames.shape[:3]
    x255 = np.clip((np.asarray(frames, np.float32) + 1.0) * 127.5, 0, 255)
    x255 = x255[..., ::-1]  # RGB -> BGR flip (modules.py:1934)
    out = []
    for i in range(n):
        candidate, subset = est(x255[i])
        if len(candidate):
            candidate = candidate.copy()
            candidate[:, 0] /= float(W)
            candidate[:, 1] /= float(H)
        canvas = np.zeros((H, W, 3), dtype=np.uint8)
        canvas = draw_bodypose(canvas, candidate, subset)
        out.append(canvas)
    poses = np.stack(out, 0).astype(np.float32) / 255.0
    return (1.0 - poses) * 2.0 - 1.0
