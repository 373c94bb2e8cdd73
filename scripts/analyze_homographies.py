"""Quantify perspective strength of the serving cut/paste homographies.

The device paste/cut warps are projective (cv2.getPerspectiveTransform of
4-point part quads, reference dataset.py:1069-1085). A TPU-native two-pass
warp needs per-line-affine maps; this script measures, over the fixture
pairs, how far each actual matrix deviates from

  (a) one global affine (the existing affine_warp machinery as-is), and
  (b) per-line affine: exact per-row offset + per-row rate, with the
      *along-row curvature* dropped (the only approximation a grouped-rate
      two-pass makes), per pass direction.

Errors are max |source-position deviation| in px over output pixels whose
source sample lands within 1px of the source patch (elsewhere both the
image and the mask are zero, so deviations are invisible).

Usage: python scripts/analyze_homographies.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mobius_errors(m, out_h, out_w, src_h, src_w):
    """Per-matrix stats dict (see module docstring)."""
    xs = np.arange(out_w, dtype=np.float64)
    ys = np.arange(out_h, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    den = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
    den = np.where(np.abs(den) < 1e-12, 1e-12, den)
    sx = (m[0, 0] * gx + m[0, 1] * gy + m[0, 2]) / den
    sy = (m[1, 0] * gx + m[1, 1] * gy + m[1, 2]) / den
    valid = ((sx >= -1) & (sx <= src_w) & (sy >= -1) & (sy <= src_h))
    if not valid.any():
        return None

    # (a) best global affine via least squares over valid pixels
    a_mat = np.stack([gx[valid], gy[valid], np.ones(valid.sum())], axis=1)
    err_aff = 0.0
    for tgt in (sx[valid], sy[valid]):
        coef, *_ = np.linalg.lstsq(a_mat, tgt, rcond=None)
        err_aff = max(err_aff, np.abs(a_mat @ coef - tgt).max())

    # (b) per-line affine: for each output row, fit sx(x) linearly over the
    # row's valid span (least squares); same for sy per column. The residual
    # is exactly the along-line curvature a grouped/per-line-rate two-pass
    # cannot represent.
    def perline(vals, mask, coords):
        worst = 0.0
        for i in range(vals.shape[0]):
            sel = mask[i]
            if sel.sum() < 3:
                continue
            x = coords[sel]
            v = vals[i, sel]
            a = np.stack([x, np.ones_like(x)], axis=1)
            coef, *_ = np.linalg.lstsq(a, v, rcond=None)
            worst = max(worst, np.abs(a @ coef - v).max())
        return worst

    err_row = perline(sx, valid, xs)                      # pass 1: x per row
    err_col = perline(sy.T, valid.T, ys)                  # pass 2: y per col
    # rate spread: how much the per-row rate varies (drives grouped-B size)
    persp = np.abs(m[2, 0]) + np.abs(m[2, 1])
    return dict(err_affine=err_aff, err_perline=max(err_row, err_col),
                persp=persp / max(abs(m[2, 2]), 1e-12))


def main():
    import bench
    from pasta_tpu import serving
    from pasta_tpu.data import preprocess as pp
    from pasta_tpu.data.roots import as_root

    fixtures = "/root/reference/test_datas"
    root = as_root(fixtures)
    names = sorted({os.path.basename(p)
                    for p in os.listdir(os.path.join(fixtures, "image"))})
    people = [pp.load_person(root, n, with_garment_parsing=True)
              for n in names]
    stats = {"cut": [], "paste_tile": []}
    from pasta_tpu.data.device_warp import paste_tile_layout, PASTE_TILE

    for i, person in enumerate(people):
        garment = people[(i + 1) % len(people)]
        host = serving.host_prepare(person, garment, "upper")
        for key in ("upper_cut_m", "lower_cut_m"):
            for pi, m in enumerate(host[key]):
                col = 0 if key == "upper_cut_m" else 1
                if not host["part_valid"][pi, col]:
                    continue
                r = mobius_errors(np.asarray(m, np.float64), 128, 128,
                                  512, 512)
                if r:
                    stats["cut"].append(r)
        offs = host["tile_offsets"]
        for pi, m in enumerate(host["paste_m_inv"]):
            if not host["part_valid"][pi, 2]:
                continue
            # tiled paste: dst is the 256-tile; fold the offset in
            t = np.eye(3)
            t[0, 2], t[1, 2] = offs[pi, 1], offs[pi, 0]
            mt = np.asarray(m, np.float64) @ t
            r = mobius_errors(mt, PASTE_TILE, PASTE_TILE, 128, 128)
            if r:
                stats["paste_tile"].append(r)

    for k, rows in stats.items():
        if not rows:
            print(f"{k}: none valid")
            continue
        for field in ("err_affine", "err_perline", "persp"):
            v = np.array([r[field] for r in rows])
            print(f"{k:12s} {field:12s} n={len(v):3d} max={v.max():.4g} "
                  f"p95={np.percentile(v, 95):.4g} med={np.median(v):.4g}")


if __name__ == "__main__":
    main()
