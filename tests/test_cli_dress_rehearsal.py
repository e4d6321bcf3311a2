"""CLI checkpoint dress rehearsal (VERDICT r4 missing-item 1).

The released-checkpoint recipe, end-to-end at the PROCESS boundary —
exactly the path a user with the real `.pth` files runs (reference
flow: `tools/test.py:113-147`):

1. a torch replica with the reference's state_dict key naming writes a
   reference-keyed ``.pth`` (``torch.save({'state_dict': ...})``);
2. subprocess ``tools/convert_checkpoint.py`` converts it to an orbax
   checkpoint;
3. subprocess ``tools/test.py CONFIG CKPT --eval mAP`` evaluates it on
   a synthetic val set and dumps metrics;
4. the same params evaluated IN-PROCESS through ``api.run_eval`` must
   produce the same mAP — proving the CLI chain neither drops nor
   perturbs weights.

Uses the tiny smoke config so the whole rehearsal runs on CPU.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_checkpoint_convert import randomize_bn  # noqa: E402
from tests.test_fullscale_parity import (TorchHead,  # noqa: E402
                                         TorchNeck3D3, TorchNerfMLP)
from tests.test_whole_model_parity import (TorchFPN,  # noqa: E402
                                           TorchResNet50, _randomize_bn)

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = os.path.join(REPO, "configs", "nerfdet",
                         "nerfdet_smoke_synthetic.py")


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    from nerfdet_tpu.api import scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.synthetic import (make_synthetic_scene,
                                            write_synthetic_scannet)
    from nerfdet_tpu.models.builder import build_model

    tmp = tmp_path_factory.mktemp("rehearsal")
    data_root = str(tmp / "synthetic")
    write_synthetic_scannet(data_root, n_scenes=2, n_images=6,
                            hw=(240, 320), with_depth=False)

    cfg = Config.fromfile(SMOKE_CFG)
    meta = scene_meta_from_config(cfg)
    model = build_model(cfg.model, meta=meta)
    scene = make_synthetic_scene(seed=0, n_views=2, n_targets=1,
                                 hw=meta.img_shape, pad_hw=meta.pad_shape,
                                 n_rand=32, margin=4)
    variables = jax.jit(
        lambda k: model.init(k, {m: jnp.asarray(v)
                                 for m, v in scene.items()},
                             train=False, with_rays=True))(
        jax.random.PRNGKey(0))

    # size the replica from the model's own init tree (the mapping /
    # nerf-mlp widths follow the config's FPN channels)
    fpn_out = cfg.model["neck"]["out_channels"]
    neck3d_out = cfg.model["neck_3d"]["out_channels"]
    map_k = np.asarray(variables["params"]["mapping"]["kernel"])
    # nerf feature layout: mapped mean + mapped var (fpn//8 each) +
    # rgb mean + rgb var (3 each) — see models/nerfdet.py nerf_density
    feat_dim = 2 * map_k.shape[1] + 6

    torch.manual_seed(7)
    backbone = TorchResNet50().eval()
    _randomize_bn(backbone)
    fpn = TorchFPN(out=fpn_out).eval()
    neck3d = TorchNeck3D3(fpn_out, neck3d_out).eval()
    randomize_bn(neck3d)
    head = TorchHead(neck3d_out).eval()
    mlp = TorchNerfMLP(feat_dim=feat_dim).eval()
    mapping = tnn.Sequential(
        tnn.Linear(map_k.shape[0], map_k.shape[1])).eval()

    state = {}
    for mod, pre in ((backbone, "backbone."), (fpn, "neck."),
                     (neck3d, "neck_3d."), (head, "bbox_head."),
                     (mlp, "nerf_mlp."), (mapping, "mapping.")):
        for k, v in mod.state_dict().items():
            state[pre + k] = v
    pth = str(tmp / "reference_keyed.pth")
    # the released checkpoints wrap the weights exactly like this
    torch.save({"state_dict": state, "meta": {"epoch": 12}}, pth)

    return dict(tmp=tmp, data_root=data_root, pth=pth, cfg=cfg,
                meta=meta, model=model, init_variables=variables)


def _run(cmd, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable] + cmd, capture_output=True,
                         text=True, timeout=1800, cwd=REPO, env=env,
                         **kw)
    assert out.returncode == 0, (
        f"{' '.join(cmd)}\nstdout:{out.stdout[-3000:]}\n"
        f"stderr:{out.stderr[-3000:]}")
    return out


def test_cli_convert_then_test_matches_in_process(rehearsal):
    from nerfdet_tpu.api import run_eval
    from nerfdet_tpu.data.dataset import build_dataset
    from nerfdet_tpu.utils import load_checkpoint
    from nerfdet_tpu.utils.weight_convert import (
        convert_reference_checkpoint, merge_params)

    r = rehearsal
    ckpt_dir = str(r["tmp"] / "converted")
    _run(["tools/convert_checkpoint.py", r["pth"], ckpt_dir,
          "--config", SMOKE_CFG])

    # derived config retargeting the data roots at the tmp dataset —
    # the same thing a user does for a local data layout
    derived = str(r["tmp"] / "smoke_local.py")
    with open(derived, "w") as f:
        f.write(
            f"_base_ = {SMOKE_CFG!r}\n"
            f"data_root = {r['data_root'] + os.sep!r}\n"
            "data = dict(\n"
            "    test=dict(data_root=data_root,\n"
            "              ann_file=data_root + 'scannet_infos_val.pkl'"
            "))\n")

    results_json = str(r["tmp"] / "metrics.json")
    _run(["tools/test.py", derived, ckpt_dir, "--eval", "mAP",
          "--out", results_json])
    with open(results_json) as f:
        cli_metrics = json.load(f)
    assert any(k.startswith("mAP") for k in cli_metrics), cli_metrics

    # ---- in-process twin: same conversion path, same eval loop ----
    ckpt = load_checkpoint(ckpt_dir)
    variables = dict(params=ckpt["params"],
                     batch_stats=ckpt.get("batch_stats", {}))
    cfg = r["cfg"]
    from nerfdet_tpu.data.dataset import rgb_stats_spec_from_config

    dataset = build_dataset(
        dict(cfg.data["test"], data_root=r["data_root"] + os.sep,
             ann_file=os.path.join(r["data_root"],
                                   "scannet_infos_val.pkl")),
        test_mode=True, use_depth=False,
        rgb_stats_spec=rgb_stats_spec_from_config(cfg))
    metrics = run_eval(r["model"], variables, dataset,
                       dict(cfg.test_cfg))
    for k, v in metrics.items():
        if k.startswith(("mAP", "mAR")):
            assert k in cli_metrics, (k, cli_metrics)
            np.testing.assert_allclose(cli_metrics[k], v, atol=1e-9,
                                       err_msg=k)

    # the converted params must BE the torch replica's weights, not a
    # re-init: spot-check one backbone kernel round-trips exactly
    sd = torch.load(r["pth"], map_location="cpu")["state_dict"]
    conv1_t = sd["backbone.conv1.weight"].numpy()  # (64, 3, 7, 7)
    conv1_j = np.asarray(ckpt["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(conv1_j,
                                  conv1_t.transpose(2, 3, 1, 0))


def test_converted_checkpoint_differs_from_init(rehearsal):
    """Guards the rehearsal itself: if conversion silently fell back to
    init weights everywhere, the equality above would be vacuous."""
    from nerfdet_tpu.utils import load_checkpoint

    r = rehearsal
    ckpt_dir = str(r["tmp"] / "converted")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("conversion test did not run first")
    ckpt = load_checkpoint(ckpt_dir)
    init = r["init_variables"]["params"]
    delta = np.abs(
        np.asarray(ckpt["params"]["backbone"]["conv1"]["kernel"])
        - np.asarray(init["backbone"]["conv1"]["kernel"])).max()
    assert delta > 1e-3
