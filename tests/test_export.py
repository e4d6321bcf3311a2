"""AOT export round-trip: serialize the inference step to StableHLO,
deserialize, and check the artifact reproduces the jitted outputs."""

import jax
import numpy as np

from nerfdet_tpu.train.step import make_eval_step
from nerfdet_tpu.utils.export import (call_exported, export_eval_step,
                                      export_info, load_exported,
                                      save_exported)
from tests.test_train_step import tiny_model, tiny_scene


def test_export_round_trip(tmp_path):
    model = tiny_model()
    scene = tiny_scene()
    variables = model.init(jax.random.PRNGKey(0), scene, train=True,
                           rng=jax.random.PRNGKey(1))
    variables = dict(params=variables["params"],
                     batch_stats=variables["batch_stats"])

    exported = export_eval_step(model, variables, scene, nms_pre=16,
                                platforms=("cpu",))
    path = str(tmp_path / "tiny.jaxexport")
    save_exported(exported, path)
    assert np.fromfile(path, np.uint8).size > 1000

    reloaded = load_exported(path)
    info = export_info(reloaded)
    assert info["platforms"] == ["cpu"]
    assert info["n_outputs"] == 2  # boxes, scores

    out = call_exported(reloaded, variables, scene)
    ref = make_eval_step(model, nms_pre=16)(
        variables["params"], variables["batch_stats"],
        {k: scene[k] for k in ("imgs", "denorm_images", "intrinsic",
                               "extrinsics", "origin")})
    np.testing.assert_allclose(np.asarray(out["boxes"]),
                               np.asarray(ref["boxes"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(ref["scores"]), atol=1e-5)


def test_export_shape_only_variables(tmp_path):
    """Export needs only ShapeDtypeStructs — no materialized weights."""
    model = tiny_model()
    scene = tiny_scene()
    abstract = jax.eval_shape(
        lambda k: model.init(k, scene, train=True,
                             rng=jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0))
    exported = export_eval_step(model, dict(abstract), scene, nms_pre=16,
                                platforms=("cpu",))
    assert exported.calling_convention_version >= 1
