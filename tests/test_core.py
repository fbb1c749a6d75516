"""Registry / arch-string / checkpoint round-trip tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.core import registry, checkpoint as C


def test_parse_spec_literals_only():
    s = registry.parse_spec(
        "hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
        "'efficientnet-b0', levels=2, kernel_sizes=[1, 3], "
        "level_channels=[16, 16], weight_groups=[8, 8], num_classes=5)")
    assert s.target.endswith("hyperseg_efficientnet")
    assert s.args == ("efficientnet-b0",)
    assert s.kwargs["level_channels"] == [16, 16]
    m = s.build()
    assert m.decoder.num_classes == 5


def test_parse_spec_rejects_code():
    with pytest.raises(ValueError):
        registry.parse_spec("mod.fn(__import__('os').system('x'))")


def test_reference_arch_string_resolves():
    # arch strings stored by the reference checkpoints use hyperseg.* paths
    s = registry.parse_spec(
        "hyperseg.models.hyperseg_v1_0.hyperseg_efficientnet("
        "'efficientnet-b0', levels=2, kernel_sizes=[1, 3], "
        "level_channels=[16, 16], weight_groups=[8, 8], num_classes=3)")
    m = s.build()
    assert m.decoder.num_classes == 3


def test_arch_string_from_partial():
    from functools import partial
    from hyperseg_tpu.models.hyperseg_v1_0 import hyperseg_efficientnet
    p = partial(hyperseg_efficientnet, "efficientnet-b0", levels=2,
                kernel_sizes=[1, 3], level_channels=[16, 16], weight_groups=[8, 8])
    s = C.arch_string(p, num_classes=7)
    m = registry.parse_spec(s).build()
    assert m.decoder.num_classes == 7


def test_checkpoint_roundtrip(tmp_path):
    arch = ("hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
            "'efficientnet-b0', levels=2, kernel_sizes=[1, 3], "
            "level_channels=[16, 16], weight_groups=[8, 8], num_classes=4)")
    model = registry.parse_spec(arch).build()
    params = model.init(jax.random.PRNGKey(0))

    C.save_checkpoint(str(tmp_path), "model", params,
                      meta={"epoch": 3, "arch": arch, "best_iou": 0.5},
                      is_best=True)
    assert os.path.exists(tmp_path / "model_best.npz")

    model2, params2, meta = C.load_model(str(tmp_path / "model_latest.npz"))
    assert meta["epoch"] == 3
    assert model2.decoder.num_classes == 4
    assert set(params2) == set(params)
    x = jnp.zeros((1, 64, 64, 3))
    np.testing.assert_allclose(np.asarray(model(params, x)),
                               np.asarray(model2(params2, x)), atol=1e-6)


def test_export_state_dict_roundtrip(reference):
    """Reverse interop: params exported with export_state_dict load back into
    the reference torch model with exact values (torch -> jax -> torch)."""
    import copy
    import torch
    from hyperseg.models.hyperseg_v1_0 import hyperseg_efficientnet
    from hyperseg_tpu.core.torch_import import convert_state_dict, export_state_dict

    kw = dict(levels=2, kernel_sizes=[1, 3], level_channels=[16, 16],
              expand_ratio=2, weight_groups=[8, 8], num_classes=4)
    torch.manual_seed(3)
    tm = hyperseg_efficientnet("efficientnet-b0", pretrained=False,
                               **copy.deepcopy(kw))
    sd = tm.state_dict()
    params = convert_state_dict(sd)
    back = export_state_dict(params)
    missing = []
    for k, v in sd.items():
        if "num_batches_tracked" in k or ".coord" in k:
            continue
        if k not in back:
            missing.append(k)
            continue
        np.testing.assert_allclose(back[k], v.numpy(), atol=1e-6, err_msg=k)
    assert not missing, missing[:5]
    # and torch accepts it
    tm.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in back.items()},
                       strict=False)


def test_opt_state_npz_roundtrip(tmp_path):
    """Optimizer moments survive save/load through the npz tree format (no
    pickle): resume reproduces the exact post-step Adam state."""
    from hyperseg_tpu.train import schedule as S, step as T

    optimizer = T.make_optimizer(S.poly_lr(1e-3, 100))
    params = {"a.weight": jnp.ones((4, 3)), "b.bias": jnp.arange(3.0)}
    state = T.init_train_state(params, optimizer)
    # advance the state so mu/nu/count are nontrivial
    import optax
    grads = {k: jnp.full_like(v, 0.5) for k, v in params.items()}
    updates, opt_state = optimizer.update(grads, state["opt_state"], params)
    path = str(tmp_path / "model_latest.opt.npz")
    C.save_opt_state(path, opt_state)

    fresh = T.init_train_state(params, optimizer)["opt_state"]
    restored = C.load_opt_state(path, fresh)
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # structure mismatch fails loudly instead of silently mis-mapping
    other = T.init_train_state({"c.weight": jnp.ones((2, 2))}, optimizer)
    with pytest.raises((KeyError, ValueError)):
        C.load_opt_state(path, other["opt_state"])
