"""Checkpoint FILE-FORMAT rehearsal (VERDICT.md round-4 item 5).

tests/test_convert.py proves the key *mapping* and test_convert_fullwidth.py
the full-width key *set*; this file exercises the actual I/O path that runs
the day real weights arrive: torch.save()d checkpoint FILES in the exact
formats of /root/reference/scripts/evaluation/infer_geo4d.py —

  * Lightning: {'state_dict': {...}} with legacy `framestride_embed` keys
    (the rename migration, infer_geo4d.py:65-69)
  * DeepSpeed: {'module': {'_forward_module.<key>': ...}} (:74-78)
  * vae.ckpt: {'state_dict': {'model.<key>': ...}} (:330-347)

— loaded through the production `cli/common._load_checkpoints_into`
(torch.load -> strip_prefixes -> convert_state_dict with tower prefixes),
then a forward pass, then an orbax save/restore round trip
(models/checkpoint.py). Torch modules are the genuine reference classes at
reduced width (tests/test_xcheck_pipeline.build_torch_models)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _refstubs  # noqa: E402

_refstubs.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

CPU = jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def models():
    import test_xcheck_pipeline as xp

    tm, pm_vae = xp.build_torch_models()
    model, converted = xp.build_jax_model((tm, pm_vae))
    return tm, pm_vae, model, converted


@pytest.fixture(scope="module")
def ckpt_files(models, tmp_path_factory):
    """Write the three reference checkpoint file formats."""
    tm, pm_vae, _, _ = models
    d = tmp_path_factory.mktemp("ckpts")
    sd = tm.state_dict()

    # Lightning format, with the LEGACY fps key naming to exercise the
    # framestride_embed -> fps_embedding migration (infer_geo4d.py:65-69)
    legacy_sd = {
        k.replace("fps_embedding", "framestride_embed"): v.clone()
        for k, v in sd.items()
    }
    assert any("framestride_embed" in k for k in legacy_sd)
    lightning = d / "model_lightning.ckpt"
    torch.save({"state_dict": legacy_sd, "epoch": 3, "global_step": 1000},
               str(lightning))

    # DeepSpeed container format: keys '_forward_module.<key>' under 'module'
    deepspeed = d / "model_deepspeed.ckpt"
    torch.save(
        {"module": {f"_forward_module.{k}": v.clone() for k, v in sd.items()}},
        str(deepspeed),
    )

    # fine-tuned pointmap VAE: 'model.'-prefixed under state_dict
    vae = d / "vae.ckpt"
    torch.save(
        {"state_dict": {f"model.{k}": v.clone()
                        for k, v in pm_vae.state_dict().items()}},
        str(vae),
    )
    return str(lightning), str(deepspeed), str(vae)


def _fresh_params(model, seed=0):
    """Random-init params for the tiny towers (arrays, not templates —
    _load_checkpoints_into overwrites mapped leaves in place)."""
    import test_xcheck_pipeline as xp

    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    with jax.default_device(CPU):
        return {
            "unet": jax.jit(lambda k: model.unet.init(
                k, jnp.zeros((1, xp.T, xp.H_PX // 8, xp.W_PX // 8, 20)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77 + xp.T * 16, xp.CTX)),
                jnp.zeros((1,), jnp.int32)))(keys[0]),
            "vae": jax.jit(lambda k: model.vae.init(
                k, jnp.zeros((1, xp.H_PX, xp.W_PX, 3))))(keys[1]),
            "pointmap_vae": jax.jit(lambda k: model.pointmap_vae.init(
                k, jnp.zeros((1, xp.H_PX, xp.W_PX, 3)),
                method=model.pointmap_vae.init_all))(keys[2]),
            "resampler": jax.jit(lambda k: model.resampler.init(
                k, jnp.zeros((1, xp.T, 17, 48))))(keys[3]),
            # CLIP towers: present because the production loader converts
            # all five towers; the checkpoint has no CLIP keys (frozen
            # external encoders) so these stay at their init values
            "clip_text": {"params": {}},
            "clip_img": {"params": {}},
        }


CONVERTED_TOWERS = ("unet", "vae", "pointmap_vae", "resampler")


def _converted_subset(params):
    return {k: params[k] for k in CONVERTED_TOWERS}


def _tree_max_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(leaves_a, leaves_b)
    )


def test_lightning_file_roundtrip(models, ckpt_files):
    """Lightning .ckpt file (with legacy fps keys) -> production loader ->
    params identical to the direct state-dict conversion -> live forward."""
    from geo4d_tpu.cli.common import _load_checkpoints_into

    _, _, model, converted = models
    lightning, _, vae = ckpt_files
    params = _fresh_params(model)
    with jax.default_device(CPU):
        _, params = _load_checkpoints_into(model, params, lightning, vae,
                                           verbose=False)
        assert _tree_max_diff(_converted_subset(params), converted) == 0.0

        # live forward through the freshly loaded weights
        z = model.encode_first_stage(
            params, jnp.zeros((1, 2, 64, 128, 3)), None
        )
        dec = model.decode_pointmap_conf(params, z[..., :4])
        assert dec.shape == (1, 2, 64, 128, 4)
        assert bool(jnp.all(jnp.isfinite(dec)))


def test_deepspeed_file_roundtrip(models, ckpt_files):
    """DeepSpeed 'module'/_forward_module container -> identical params."""
    from geo4d_tpu.cli.common import _load_checkpoints_into

    _, _, model, converted = models
    _, deepspeed, vae = ckpt_files
    params = _fresh_params(model, seed=1)
    with jax.default_device(CPU):
        _, params = _load_checkpoints_into(model, params, deepspeed, vae,
                                           verbose=False)
        assert _tree_max_diff(_converted_subset(params), converted) == 0.0


def test_orbax_roundtrip(models, tmp_path):
    """orbax save -> restore reproduces the converted tree bit-for-bit
    (models/checkpoint.py save_checkpoint/restore_checkpoint)."""
    pytest.importorskip("orbax.checkpoint")
    from geo4d_tpu.models.checkpoint import restore_checkpoint, save_checkpoint

    _, _, _, converted = models
    path = os.path.join(str(tmp_path), "orbax_ckpt")
    save_checkpoint(path, converted)
    restored = restore_checkpoint(path, converted)
    assert _tree_max_diff(restored, converted) == 0.0


def test_loader_rejects_missing_file(models):
    """Missing paths are a no-op (params unchanged), matching the CLI's
    'random weights when absent' contract (cli/common.py:66,84)."""
    from geo4d_tpu.cli.common import _load_checkpoints_into

    _, _, model, _ = models
    params = _fresh_params(model, seed=2)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    _, params = _load_checkpoints_into(
        model, params, "/nonexistent/model.ckpt", "/nonexistent/vae.ckpt",
        verbose=False,
    )
    assert _tree_max_diff(params, before) == 0.0
