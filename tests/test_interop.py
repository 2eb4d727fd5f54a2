"""Reference torch .pth checkpoint import (engine/interop.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_segmentation_project_tpu.engine import checkpoint as ckpt
from multimodal_segmentation_project_tpu.engine.interop import (
    load_torch_checkpoint,
    torch_state_dict_to_trees,
)
from multimodal_segmentation_project_tpu.models import UNet3D

FEATURES = (4, 8)


def reference_shaped_state_dict(features=FEATURES, in_ch=1, out_ch=4, seed=0):
    """Synthesize a state_dict with the reference UNet3D's key layout
    (encoder.N.double_conv.{0,1,4,5}, upconvs.N, decoder.N, final_conv;
    documented in SURVEY.md section 2 and engine/interop.py)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def double_conv(prefix, cin, cout):
        sd[f"{prefix}.double_conv.0.weight"] = torch.randn(cout, cin, 3, 3, 3, generator=g)
        sd[f"{prefix}.double_conv.0.bias"] = torch.randn(cout, generator=g)
        sd[f"{prefix}.double_conv.1.weight"] = torch.randn(cout, generator=g).abs() + 0.5
        sd[f"{prefix}.double_conv.1.bias"] = torch.randn(cout, generator=g) * 0.1
        sd[f"{prefix}.double_conv.1.running_mean"] = torch.randn(cout, generator=g) * 0.1
        sd[f"{prefix}.double_conv.1.running_var"] = torch.randn(cout, generator=g).abs() + 0.9
        sd[f"{prefix}.double_conv.1.num_batches_tracked"] = torch.tensor(0)
        sd[f"{prefix}.double_conv.4.weight"] = torch.randn(cout, cout, 3, 3, 3, generator=g)
        sd[f"{prefix}.double_conv.4.bias"] = torch.randn(cout, generator=g)
        sd[f"{prefix}.double_conv.5.weight"] = torch.randn(cout, generator=g).abs() + 0.5
        sd[f"{prefix}.double_conv.5.bias"] = torch.randn(cout, generator=g) * 0.1
        sd[f"{prefix}.double_conv.5.running_mean"] = torch.randn(cout, generator=g) * 0.1
        sd[f"{prefix}.double_conv.5.running_var"] = torch.randn(cout, generator=g).abs() + 0.9
        sd[f"{prefix}.double_conv.5.num_batches_tracked"] = torch.tensor(0)

    cin = in_ch
    for i, f in enumerate(features):
        double_conv(f"encoder.{i}", cin, f)
        cin = f
    double_conv("bottleneck", features[-1], features[-1] * 2)
    for i, f in enumerate(reversed(features)):
        sd[f"upconvs.{i}.weight"] = torch.randn(f * 2, f, 2, 2, 2, generator=g)
        sd[f"upconvs.{i}.bias"] = torch.randn(f, generator=g)
        double_conv(f"decoder.{i}", f * 2, f)
    sd["final_conv.weight"] = torch.randn(out_ch, features[0], 1, 1, 1, generator=g)
    sd["final_conv.bias"] = torch.randn(out_ch, generator=g)
    return sd


def test_torch_import_shapes_and_values(tmp_path):
    model = UNet3D(out_channels=4, features=FEATURES, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    )
    sd = reference_shaped_state_dict()
    path = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd}, path)

    params, stats = load_torch_checkpoint(
        path, variables["params"], variables["batch_stats"]
    )
    # structures match the flax trees exactly
    assert jax.tree.structure(params) == jax.tree.structure(variables["params"])
    assert jax.tree.structure(stats) == jax.tree.structure(variables["batch_stats"])
    # spot-check a conv kernel layout conversion (OIDHW -> DHWIO)
    w_torch = sd["encoder.0.double_conv.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["enc0"]["conv0"]["kernel"]),
        np.transpose(w_torch, (2, 3, 4, 1, 0)),
        rtol=1e-6,
    )
    # transpose-conv layout (Cin, Cout, k,k,k) -> (k,k,k,Cin,Cout)
    tw = sd["upconvs.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["dec0"]["up"]["kernel"]),
        np.transpose(tw, (2, 3, 4, 0, 1)),
        rtol=1e-6,
    )
    # head squeeze + transpose
    fw = sd["final_conv.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["head_kernel"]), fw[:, :, 0, 0, 0].T, rtol=1e-6
    )
    # BN running stats land in batch_stats
    np.testing.assert_allclose(
        np.asarray(stats["enc0"]["bn0"]["mean"]),
        sd["encoder.0.double_conv.1.running_mean"].numpy(),
        rtol=1e-6,
    )
    # imported model runs
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 1, 8, 8, 8), jnp.float32), train=False)
    assert out.shape == (1, 4, 8, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_load_params_any_dispatches_pth(tmp_path):
    model = UNet3D(out_channels=4, features=FEATURES, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    )
    sd = reference_shaped_state_dict(seed=3)
    path = str(tmp_path / "ref.pth")
    torch.save(sd, path)  # raw state_dict (no wrapper dict)
    params, stats = ckpt.load_params_any(
        path, variables["params"], variables["batch_stats"]
    )
    assert jax.tree.structure(params) == jax.tree.structure(variables["params"])


def test_partial_pth_strict_false_merges(tmp_path):
    """A PARTIAL reference checkpoint (e.g. encoder-only) through the
    DANN strict=False pretrained path (train_dann.py:410-412): present
    keys load, missing ones keep the freshly initialized target values.
    Round-1 behavior was a KeyError (VERDICT weak #8)."""
    model = UNet3D(out_channels=4, features=FEATURES, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    )
    sd = reference_shaped_state_dict(seed=5)
    partial = {k: v for k, v in sd.items() if k.startswith("encoder.")}
    path = str(tmp_path / "partial.pth")
    torch.save({"model_state_dict": partial}, path)

    # strict=True must fail loudly
    with pytest.raises(KeyError):
        ckpt.load_params_any(
            path, variables["params"], variables["batch_stats"], strict=True
        )

    params, stats = ckpt.load_params_any(
        path, variables["params"], variables["batch_stats"], strict=False
    )
    assert jax.tree.structure(params) == jax.tree.structure(variables["params"])
    # encoder weights imported from the checkpoint
    np.testing.assert_allclose(
        np.asarray(params["enc0"]["conv0"]["kernel"]),
        np.transpose(sd["encoder.0.double_conv.0.weight"].numpy(), (2, 3, 4, 1, 0)),
        rtol=1e-6,
    )
    # decoder/head keep the target initialization
    np.testing.assert_array_equal(
        np.asarray(params["head_kernel"]), np.asarray(variables["params"]["head_kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(params["dec0"]["up"]["kernel"]),
        np.asarray(variables["params"]["dec0"]["up"]["kernel"]),
    )
    # encoder BN stats imported, decoder BN stats kept
    np.testing.assert_allclose(
        np.asarray(stats["enc0"]["bn0"]["mean"]),
        sd["encoder.0.double_conv.1.running_mean"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(stats["dec0"]["conv"]["bn0"]["mean"]),
        np.asarray(variables["batch_stats"]["dec0"]["conv"]["bn0"]["mean"]),
    )


def test_module_prefix_stripped():
    sd = reference_shaped_state_dict(seed=1)
    sd = {f"module.{k}": v for k, v in sd.items()}
    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    assert "enc0" in params and "head_kernel" in params
