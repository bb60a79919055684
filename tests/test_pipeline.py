"""Pipeline parallelism: GPipe microbatch pipelining over a ``stage`` axis.

The pipelined block stack must be numerically identical to the sequential
loop (same ops on the same floats, only executed on different devices), both
forward and through ``jax.grad``; and it must compose with data parallelism
on a ``("data", "stage")`` mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.parallel.mesh import make_mesh
from telugu_asr_tpu.parallel.pipeline import pipeline_blocks, stack_block_params

pytestmark = pytest.mark.quick


def _toy_blocks(key, num_blocks, d):
    keys = jax.random.split(key, num_blocks)
    return [
        {
            "w": jax.random.normal(k, (d, d)) / np.sqrt(d),
            "b": jnp.zeros((d,)),
        }
        for k in keys
    ]


def _toy_fn(bp, x, aux):
    # residual dense + mask multiply: exercises aux threading per microbatch
    return x + jnp.tanh(x @ bp["w"] + bp["b"]) * aux["mask"][..., None]


def _sequential(blocks, x, aux):
    for bp in blocks:
        x = _toy_fn(bp, x, aux)
    return x


@pytest.fixture(scope="module")
def toy():
    d, batch, t = 16, 8, 6
    blocks = _toy_blocks(jax.random.PRNGKey(0), 4, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, t, d))
    aux = {"mask": (jax.random.uniform(jax.random.PRNGKey(2), (batch, t)) > 0.3).astype(x.dtype)}
    return blocks, x, aux


def test_pipeline_matches_sequential(toy):
    blocks, x, aux = toy
    mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
    y_ref = _sequential(blocks, x, aux)
    y_pp = pipeline_blocks(
        mesh, _toy_fn, stack_block_params(blocks), x, aux, n_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), rtol=1e-6)


def test_pipeline_two_blocks_per_stage(toy):
    blocks, x, aux = toy
    mesh = make_mesh(("stage",), (2,), devices=jax.devices()[:2])
    y_ref = _sequential(blocks, x, aux)
    y_pp = pipeline_blocks(
        mesh, _toy_fn, stack_block_params(blocks), x, aux, n_microbatches=2
    )
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), rtol=1e-6)


def test_pipeline_composes_with_data_parallel(toy):
    blocks, x, aux = toy
    mesh = make_mesh(("data", "stage"), (2, 4))
    y_ref = _sequential(blocks, x, aux)
    y_pp = pipeline_blocks(
        mesh, _toy_fn, stack_block_params(blocks), x, aux,
        n_microbatches=4, batch_axis="data",
    )
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), rtol=1e-6)


def test_pipeline_gradient_matches_sequential(toy):
    """jax.grad through the scan + ppermute = the backward pipeline."""
    blocks, x, aux = toy
    mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
    stacked = stack_block_params(blocks)

    def loss_pp(p):
        return jnp.sum(
            pipeline_blocks(mesh, _toy_fn, p, x, aux, n_microbatches=4) ** 2
        )

    def loss_ref(p):
        blks = [jax.tree_util.tree_map(lambda q: q[i], p) for i in range(4)]
        return jnp.sum(_sequential(blks, x, aux) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g_pp, g_ref,
    )


def test_pipeline_shape_laws(toy):
    blocks, x, aux = toy
    mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
    stacked = stack_block_params(blocks)
    with pytest.raises(ValueError):
        pipeline_blocks(mesh, _toy_fn, stacked, x, aux, n_microbatches=3)
    with pytest.raises(ValueError):
        pipeline_blocks(
            make_mesh(("stage",), (3,), devices=jax.devices()[:3]), _toy_fn, stacked, x, aux,
            n_microbatches=4,
        )


def test_pipeline_moonshine_encoder_blocks():
    """The flagship encoder's 4 MHSA→FFN blocks pipelined over 4 stages ==
    the sequential encoder (subsampling runs replicated up front)."""
    from telugu_asr_tpu.models.moonshine.encoder import (
        EncoderConfig, encoder_apply, encoder_init,
    )
    from telugu_asr_tpu.ops.attention import mhsa_module_apply
    from telugu_asr_tpu.ops.conv import conv1d_subsampling_apply
    from telugu_asr_tpu.ops.mlp import ffn_module_apply

    cfg = EncoderConfig(d_model=32, num_blocks=4, num_heads=2, head_dim=16,
                        in_channels=8)
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    features = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 8))
    lengths = jnp.asarray([64, 50, 40, 30])

    y_ref, mask_ref = encoder_apply(params, cfg, features, lengths)

    x, out_lengths = conv1d_subsampling_apply(
        params["subsampling"], features, lengths,
        kernel_size=cfg.sub_kernel_size, strides=cfg.sub_strides,
        padding=cfg.sub_padding, activations=cfg.sub_activations,
    )
    out_lengths = jnp.maximum(out_lengths, 0)
    mask = jnp.arange(x.shape[1])[None, :] < out_lengths[:, None]

    def block_fn(bp, h, aux):
        h = mhsa_module_apply(bp["mhsa"], h, cfg.num_heads,
                              padding_mask=aux["mask"], deterministic=True)
        return ffn_module_apply(bp["ffn"], h, cfg.activation,
                                deterministic=True)

    mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
    y_pp = pipeline_blocks(
        mesh, block_fn, stack_block_params(params["blocks"]), x,
        {"mask": mask}, n_microbatches=2,
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
