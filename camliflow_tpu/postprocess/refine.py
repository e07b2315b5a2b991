"""Rigid-background refinement for the KITTI leaderboard (pure NumPy/OpenCV).

Reference semantics: refine_utils.py:46-340 — estimate camera pose from flow
correspondences via essential-matrix RANSAC, midpoint-triangulate, register
scale against the input disparity via log-ratio RANSAC, refine with PnP, then
overwrite background flow and disparity-change with the rigid reprojection.

The reference optionally uses NG-RANSAC; we use the cv2.findEssentialMat
fallback it also supports (refine_utils.py:183-187). The torch tensors the
reference used as a numpy substitute (midpoint_triangulate) are plain numpy
here.
"""

from __future__ import annotations

import cv2
import numpy as np


def triangulation(disp, xcoord, ycoord, bl=1.0, fl=450.0, cx=479.5, cy=269.5):
    """Lift disparity to homogeneous 3D points (refine_utils.py:46-55)."""
    mask = (disp <= 0).flatten()
    depth = bl * fl / disp
    X = (xcoord - cx) * depth / fl
    Y = (ycoord - cy) * depth / fl
    P = np.stack([X, Y, depth], axis=0).reshape(3, -1)
    P = np.concatenate([P, np.ones((1, P.shape[-1]))], axis=0)
    P[:, mask] = 0
    return P


def midpoint_triangulate(x, cam):
    """Midpoint triangulation over 2 cameras (refine_utils.py:59-110).

    x: [3, n_cams, N] homogeneous image points. cam: list of 3x4 matrices.
    Returns ([3, N] points, [N, 3, n] directional vectors).
    """
    n = len(cam)
    N = x.shape[-1]
    I = np.eye(3)
    A = np.zeros((3, n))
    B = np.zeros((3, n, N))
    sigma2 = np.zeros((3, N))

    for i in range(n):
        a = -np.linalg.inv(cam[i][:3, :3]).dot(cam[i][:3, -1:])
        A[:, i, None] = a
        if i == 0:
            b = np.linalg.pinv(cam[i][:3, :3]).dot(x[:, i])
        else:
            b = np.linalg.pinv(cam[i]).dot(x[:, i])
            b = b / b[3:]
            b = b[:3, :] - a
        b = b / np.linalg.norm(b, 2, 0)[np.newaxis]
        B[:, i, :] = b
        sigma2 = sigma2 + b * (b.T.dot(a).reshape(-1, N))

    Bo = B.transpose([2, 0, 1])  # [N, 3, n]
    Bt = B.transpose([2, 1, 0])  # [N, n, 3]

    BoBt = np.matmul(Bo, Bt)  # [N, 3, 3]
    C = (n * I)[np.newaxis] - BoBt
    Cinv = np.linalg.inv(C)
    sigma1 = np.sum(A, axis=1)[:, None]  # [3, 1]
    m1 = I[np.newaxis] + np.matmul(BoBt, Cinv)
    m2 = np.matmul(Cinv, sigma2.T[:, :, np.newaxis])
    midpoint = (1.0 / n) * np.matmul(m1, sigma1[np.newaxis]) - m2
    return midpoint[:, :, 0].T, Bo


def register_disp_fast(id_flow, id_mono, mask, inlier_th=0.01, niters=100):
    """Scale registration by RANSAC over disparity log-ratios
    (refine_utils.py:114-145)."""
    shape = id_mono.shape
    id_mono = id_mono.flatten()
    disp_flow = id_flow[mask]
    disp_mono = id_mono[mask]

    num_samp = min(3000, len(disp_flow))
    np.random.seed(0)
    submask = np.random.choice(range(len(disp_flow)), num_samp)
    disp_flow = disp_flow[submask]
    disp_mono = disp_mono[submask]

    n = len(disp_flow)
    rand_idx = np.random.choice(range(n), niters)
    scale_cand = (disp_flow / disp_mono)[rand_idx]
    dis_cand = np.abs(
        np.log(disp_mono[:, np.newaxis] * scale_cand[np.newaxis])
        - np.log(disp_flow[:, np.newaxis])
    )
    rank_metric = (dis_cand < inlier_th).sum(0)
    scale = scale_cand[np.argmax(rank_metric)]

    dis = np.abs(np.log(disp_mono * scale) - np.log(disp_flow))
    ninliers = (dis < inlier_th).sum() / n
    registered_flow = id_flow.reshape(shape) / scale
    return registered_flow, scale, ninliers


def test_essential(K0, K1, R, T, p1, p2):
    """Cheirality check for an (R, T) decomposition (refine_utils.py:214-223)."""
    testP = cv2.triangulatePoints(
        K0.dot(np.concatenate((np.eye(3), np.zeros((3, 1))), -1)),
        K1.dot(np.concatenate((R, T), -1)),
        p1[:2],
        p2[:2],
    )
    Z1 = testP[2, :] / testP[-1, :]
    Z2 = (R.dot(Z1 * np.linalg.inv(K0).dot(p1)) + T)[-1, :]
    return ((Z1 > 0).sum() > (Z1 <= 0).sum()) and ((Z2 > 0).sum() > (Z2 <= 0).sum())


def find_pose(hp0, hp1, K0, K1):
    """Essential-matrix pose via cv2 RANSAC (refine_utils.py:149-210, cv path)."""
    nhp0 = np.linalg.inv(K0).dot(hp0)
    nhp1 = np.linalg.inv(K1).dot(hp1)
    pts1 = nhp0[:2].T
    pts2 = nhp1[:2].T
    E, _ = cv2.findEssentialMat(pts1, pts2, np.eye(3), cv2.FM_RANSAC, threshold=0.0001)
    if E is None or E.shape != (3, 3):
        return np.eye(3), np.asarray([0, 0, 1.0]), None
    R01 = np.eye(3)
    T01 = np.asarray([0, 0, 1.0])
    R1, R2, T = cv2.decomposeEssentialMat(E)
    for rott in [(R1, T), (R2, T), (R1, -T), (R2, -T)]:
        if test_essential(K0, K1, rott[0], rott[1], hp0, hp1):
            R01 = rott[0].T
            T01 = -R01.dot(rott[1][:, 0])
    return R01, T01, E


def pose_estimate(K0, K1, hp0, hp1, strict_mask):
    """Pose from a subsample of valid correspondences (refine_utils.py:227-258)."""
    tmphp0 = hp0[:, strict_mask]
    tmphp1 = hp1[:, strict_mask]
    num_samp = min(3000, tmphp0.shape[1])
    submask = np.random.choice(range(tmphp0.shape[1]), num_samp)
    tmphp0 = tmphp0[:, submask]
    tmphp1 = tmphp1[:, submask]

    R01, T01, E = find_pose(tmphp0, tmphp1, K0, K1)

    H01 = K0.dot(R01).dot(np.linalg.inv(K1))  # plane at infinity
    comp_hp1 = H01.dot(hp1)
    comp_hp1 = comp_hp1 / comp_hp1[-1:]
    return R01, T01, H01, comp_hp1, E


def evaluate_tri(
    t10, R01, K0, K1, hp0, hp1, disp0, bl, inlier_th=0.1, select_th=0.4, valid_mask=None
):
    """Triangulate + scale-register, return agreement mask
    (refine_utils.py:262-288)."""
    if valid_mask is not None:
        hp0 = hp0[:, valid_mask]
        hp1 = hp1[:, valid_mask]
        disp0 = disp0.flatten()[valid_mask]
    cams = [
        K0.dot(np.concatenate((np.eye(3), np.zeros((3, 1))), -1)),
        K1.dot(np.concatenate((R01.T, -R01.T.dot(t10[:, np.newaxis])), -1)),
    ]
    P_pred, _ = midpoint_triangulate(
        np.concatenate([hp0[:, np.newaxis], hp1[:, np.newaxis]], 1), cams
    )
    idepth_p3d = np.clip(K0[0, 0] * bl / P_pred[2], 1e-6, np.inf)

    entmask = np.logical_and(idepth_p3d > 1e-12, ~np.isinf(idepth_p3d))
    entmask_tmp = entmask[entmask].copy()
    entmask_tmp[np.argsort(-idepth_p3d[entmask])[entmask.sum() // 2 :]] = False
    entmask[entmask] = entmask_tmp
    med = np.median(idepth_p3d[entmask])
    entmask = np.logical_and(
        entmask, np.logical_and(idepth_p3d > med / 5.0, idepth_p3d < med * 5)
    )
    if entmask.sum() < 10:
        return None, None, None
    registered_p3d, scale, _ = register_disp_fast(
        idepth_p3d, disp0, entmask, inlier_th=inlier_th, niters=100
    )
    disp_ratio = np.abs(np.log(registered_p3d.flatten() / disp0.flatten()))
    agree_mask = disp_ratio < np.log(select_th)
    rank = np.argsort(disp_ratio)
    return agree_mask, t10 * scale, rank


def mod_flow(bg_mask, disp, disp_change, flow, K0, K1, bl, occ_mask, parallax_th=8):
    """Overwrite background flow/disp-change with a rigid-scene reprojection
    (refine_utils.py:291-340)."""
    flow = flow.copy()
    h, w = flow.shape[:2]
    x0, y0 = np.meshgrid(range(w), range(h))
    x0 = x0.astype(np.float32)
    y0 = y0.astype(np.float32)
    x1 = x0 + flow[:, :, 0]
    y1 = y0 + flow[:, :, 1]
    ones = np.ones_like(x1)
    hp0 = np.stack([x0, y0, ones], 0).reshape(3, -1)
    hp1 = np.stack([x1, y1, ones], 0).reshape(3, -1)

    valid_mask = np.logical_and(
        disp > 0, np.logical_and(bg_mask, occ_mask)
    ).flatten()

    R01, T01, _, comp_hp1, _ = pose_estimate(K0, K1, hp0, hp1, valid_mask)

    parallax = np.transpose(comp_hp1[:2] - hp0[:2], [1, 0]).reshape(x1.shape + (2,))
    parallax_mag = np.linalg.norm(parallax[:, :, :2], 2, 2)

    reg_flow_P = triangulation(
        disp, x0, y0, bl=bl, fl=K0[0, 0], cx=K0[0, 2], cy=K0[1, 2]
    )[:3]

    is_static = parallax_mag[bg_mask].mean() < parallax_th

    if not is_static:
        aligned_mask, T01_c, ranked_p = evaluate_tri(
            T01, R01, K0, K1, hp0, hp1, disp, bl,
            inlier_th=0.01, select_th=1.2, valid_mask=valid_mask,
        )
        if aligned_mask is None:
            return flow, disp_change
        aligned_mask[ranked_p[50000:]] = False
        tmp = valid_mask.copy()
        tmp[tmp] = aligned_mask
        aligned_mask = tmp

        # DLS was removed in OpenCV 5 (and internally mapped to EPnP in
        # late OpenCV 4, which the reference ran on)
        pnp_flag = getattr(cv2, "SOLVEPNP_DLS", cv2.SOLVEPNP_EPNP)
        _, rvec, T01 = cv2.solvePnP(
            reg_flow_P.T[aligned_mask.flatten(), np.newaxis],
            hp1[:2].T[aligned_mask.flatten(), np.newaxis],
            K0, np.zeros(4), flags=pnp_flag,
        )
        _, rvec, T01 = cv2.solvePnP(
            reg_flow_P.T[aligned_mask, np.newaxis],
            hp1[:2].T[aligned_mask, np.newaxis],
            K0, np.zeros(4), rvec, T01,
            useExtrinsicGuess=True, flags=cv2.SOLVEPNP_ITERATIVE,
        )
        R01 = cv2.Rodrigues(rvec)[0].T
        T01_c = -R01.dot(T01)[:, 0]

        if not (T01_c is None or np.isinf(np.linalg.norm(T01_c))):
            reg_flow_PP = R01.T.dot(reg_flow_P) - R01.T.dot(T01_c)[:, np.newaxis]
            hpp1 = K0.dot(reg_flow_PP)
            hpp1 = hpp1 / hpp1[-1:]
            flow[bg_mask] = (hpp1 - hp0).T.reshape(h, w, 3)[bg_mask][:, :2]
            disp_change[bg_mask] = bl * K0[0, 0] / reg_flow_PP[-1].reshape(h, w)[bg_mask]

    return flow, disp_change
