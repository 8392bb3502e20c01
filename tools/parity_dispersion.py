"""Adjudication probe: is the region-modality golden-gradient deviation sampling noise?

The reference goldens (M3T/data/modality_test/*) integrate over n_points=200 contour
points sampled with std::mt19937 from a GL-rasterized 2000^2 silhouette
(region_model.cpp:513-516); our generator samples its own contour with its own RNG, so
the POINT SETS differ even at seed parity.  This probe regenerates our region model with
several seeds and measures the seed-to-seed dispersion of the gradient/Hessian produced
by the exact golden setup (modality_test.cpp:280-349).  If cross-seed cosine dispersion
matches the deviation from the golden, the deviation is attributable to point sampling,
which fixes the justified tolerances for tests/test_reference_parity.py.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_probe import (REF, WORLD2BODY, load_golden, triangle_body,
                                closest_view_index)
from m3t_tpu.camera import LoaderColorCamera
from m3t_tpu.region_model import RegionModel
from m3t_tpu.region_modality import RegionModality


def gradients_for_seed(tmp, body, cam, seed):
    model = RegionModel(f"rm_seed{seed}", body,
                        os.path.join(tmp, f"rm_seed{seed}.npz"),
                        view_subset=[closest_view_index(body, cam)], seed=seed)
    assert model.SetUp()
    mod = RegionModality(f"region_modality_{seed}", body, cam, model)
    assert mod.SetUp()
    assert mod.StartModality(0, 0)
    assert mod.CalculateCorrespondences(0, 0)
    out = {}
    assert mod.CalculateGradientAndHessian(0, 0, 0)
    out["global_gradient"] = np.asarray(mod.gradient, np.float64).ravel()
    out["global_hessian"] = np.asarray(mod.hessian, np.float64).ravel()
    assert mod.CalculateGradientAndHessian(0, 0, 1)
    out["local_gradient"] = np.asarray(mod.gradient, np.float64).ravel()
    out["local_hessian"] = np.asarray(mod.hessian, np.float64).ravel()
    return out


def cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def main():
    seeds = [7, 8, 9, 10, 11]
    body = triangle_body()
    cam = LoaderColorCamera(
        "color_camera", metafile_path=os.path.join(REF, "_sequence/color_camera.yaml"))
    assert cam.SetUp()
    goldens = {
        "global_gradient": load_golden(
            os.path.join(REF, "modality_test/region_modality_global_gradient.txt")),
        "global_hessian": load_golden(
            os.path.join(REF, "modality_test/region_modality_global_hessian.txt")),
        "local_gradient": load_golden(
            os.path.join(REF, "modality_test/region_modality_local_gradient.txt")),
        "local_hessian": load_golden(
            os.path.join(REF, "modality_test/region_modality_local_hessian.txt")),
    }

    with tempfile.TemporaryDirectory() as tmp:
        results = {s: gradients_for_seed(tmp, body, cam, s) for s in seeds}

    for key, golden in goldens.items():
        g = golden.astype(np.float64).ravel()
        pair = [cos(results[a][key], results[b][key])
                for i, a in enumerate(seeds) for b in seeds[i + 1:]]
        vs_golden = [cos(results[s][key], g) for s in seeds]
        ratio = [np.linalg.norm(results[s][key]) / np.linalg.norm(g) for s in seeds]
        print(f"{key}:")
        print(f"  cross-seed cos: min={min(pair):.4f} mean={np.mean(pair):.4f}")
        print(f"  vs golden cos:  min={min(vs_golden):.4f} mean={np.mean(vs_golden):.4f}"
              f" max={max(vs_golden):.4f}")
        print(f"  |ours|/|golden|: min={min(ratio):.3f} max={max(ratio):.3f}")


if __name__ == "__main__":
    main()
