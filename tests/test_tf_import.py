"""TF checkpoint importer: name mapping + kernel conventions."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")
from import_tf_checkpoint import CONV_LAYERS, DECONV_LAYERS, convert

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.training import state as state_lib


def fake_tf_vars(cfg):
    """Build a TF-style var dict with shapes matching the tiny model."""
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    tf_vars = {}
    flax_params = state.params["params"]
    for layer in CONV_LAYERS:
        k = np.asarray(flax_params[layer]["kernel"])
        tf_vars[f"net/{layer}/weights"] = rng.randn(*k.shape).astype(
            np.float32)
        tf_vars[f"net/{layer}/biases"] = rng.randn(k.shape[-1]).astype(
            np.float32)
        if layer != "color_pred":
            c = k.shape[-1]
            tf_vars[f"net/{layer}/LayerNorm/beta"] = rng.randn(c).astype(
                np.float32)
            tf_vars[f"net/{layer}/LayerNorm/gamma"] = rng.randn(c).astype(
                np.float32)
    for layer in DECONV_LAYERS:
        k = np.asarray(flax_params[layer]["kernel"])  # [kh,kw,in,out]
        kh, kw, cin, cout = k.shape
        tf_vars[f"net/{layer}/weights"] = rng.randn(
            kh, kw, cout, cin).astype(np.float32)  # TF [kh,kw,out,in]
        tf_vars[f"net/{layer}/biases"] = rng.randn(cout).astype(np.float32)
        tf_vars[f"net/{layer}/LayerNorm/beta"] = rng.randn(cout).astype(
            np.float32)
        tf_vars[f"net/{layer}/LayerNorm/gamma"] = rng.randn(cout).astype(
            np.float32)
    return tf_vars, state, model


def test_convert_tree_matches_model():
    cfg = MatryConfig(height=32, width=64, num_psv_planes=2,
                      num_msi_planes=2, ngf=8,
                      compute_dtype="float32").validate()
    tf_vars, state, model = fake_tf_vars(cfg)
    params = convert(tf_vars)
    # structural match with the model's own init tree
    ref_tree = jax.tree.structure(
        jax.tree.map(lambda x: x.shape, state.params))
    got_tree = jax.tree.structure(
        jax.tree.map(lambda x: x.shape, params))
    assert ref_tree == got_tree
    for path, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            zip(jax.tree.leaves(state.params), jax.tree.leaves(params))):
        assert np.asarray(a).shape == np.asarray(b).shape, path

    # the model runs with the imported params
    x = jnp.zeros((1, cfg.height, cfg.width, cfg.num_net_inputs()))
    y = model.apply(params, x)
    assert y.shape == (1, cfg.height, cfg.width, cfg.num_net_outputs())
    assert np.isfinite(np.asarray(y)).all()


def test_deconv_kernel_convention():
    """TF conv2d_transpose vs flax ConvTranspose: flip + swap makes them
    numerically identical."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    k_tf = rng.randn(4, 4, 3, 2).astype(np.float32)  # [kh,kw,out,in]

    # TF semantics: conv2d_transpose = gradient of conv2d wrt input
    def fwd_conv(y):
        # the forward conv being differentiated: [1,14,14,3] -> [1,6,6,2],
        # HWIO filter = k_tf's [kh, kw, out(=3), in(=2)] read as [in, out]
        return jax.lax.conv_general_dilated(
            y, jnp.asarray(k_tf),
            (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_shape = fwd_conv(jnp.zeros((1, 14, 14, 3))).shape
    assert y_shape == x.shape
    tf_out = jax.vjp(fwd_conv, jnp.zeros((1, 14, 14, 3)))[1](x)[0]

    # flax ConvTranspose with converted kernel
    import flax.linen as nn
    k_flax = np.transpose(k_tf[::-1, ::-1], (0, 1, 3, 2))  # [kh,kw,in,out]
    mod = nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="VALID",
                           use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(k_flax)}}
    flax_out = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(flax_out), np.asarray(tf_out),
                               rtol=1e-4, atol=1e-5)


def test_tensor_bundle_roundtrip(tmp_path):
    """Pure-python TensorBundle writer -> reader, bit-exact, multiple
    sstable blocks (>4KB of index entries) and mixed dtypes."""
    import tensor_bundle

    rng = np.random.RandomState(0)
    tensors = {
        f"net/layer_{i:03d}/weights": rng.randn(3, 3, 8, 8).astype(
            np.float32) for i in range(40)
    }
    tensors["global_step"] = np.asarray(140000, np.int64).reshape(())
    tensors["a/int_vec"] = rng.randint(-5, 5, (17,)).astype(np.int32)
    prefix = str(tmp_path / "model.latest-140000")
    tensor_bundle.save(prefix, tensors)
    got = tensor_bundle.load(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(got[k], tensors[k])


def test_checkpoint_parity_dress_rehearsal(tmp_path):
    """The full parity pipeline with no external steps: flax params ->
    reference-named TF-v1 checkpoint (pure-python writer) -> reimport
    (pure-python reader + converter) -> BIT-IDENTICAL params and
    bit-identical network outputs. The day a real reference checkpoint
    is downloadable, only `load_tf_vars(prefix)` changes its input."""
    import tensor_bundle
    from import_tf_checkpoint import load_tf_vars, to_tf_vars

    cfg = MatryConfig(height=32, width=64, num_psv_planes=2,
                      num_msi_planes=2, ngf=8,
                      compute_dtype="float32").validate()
    state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))

    tf_vars = to_tf_vars(state.params)
    assert "net/conv1_1/weights" in tf_vars
    assert "net/conv6_1/LayerNorm/gamma" in tf_vars
    prefix = str(tmp_path / "model.latest-0")
    tensor_bundle.save(prefix, tf_vars)

    reimported = convert(load_tf_vars(prefix))
    flat_a = jax.tree_util.tree_leaves_with_path(state.params["params"])
    flat_b = reimported["params"]
    for path, leaf in flat_a:
        node = flat_b
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=str(path))

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, cfg.height, cfg.width,
                             2 * cfg.num_psv_planes * 3).astype(
                                 np.float32))
    out_a = model.apply(state.params, x)
    out_b = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray,
                                          reimported["params"])}, x)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
