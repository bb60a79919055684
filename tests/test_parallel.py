"""Distribution layer: mesh construction, batch padding, sharded decode."""
import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.decode.greedy import greedy_decode
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from telugu_asr_tpu.parallel.mesh import pad_batch_to_multiple
from tests.test_moonshine import tiny_config


def test_make_mesh_axes():
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh(("data", "model"), (4, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_pad_batch_to_multiple():
    batch = {"audio": np.ones((5, 10), np.float32), "tokens": np.ones((5, 3), np.int32)}
    padded, real = pad_batch_to_multiple(batch, 8, pad_id=2)
    assert real == 5
    assert padded["audio"].shape == (8, 10)
    assert np.all(padded["audio"][5:] == 0.0)
    assert np.all(padded["tokens"][5:] == 2)
    same, real2 = pad_batch_to_multiple({"x": np.ones((8, 2))}, 8)
    assert real2 == 8 and same["x"].shape == (8, 2)


def test_sharded_greedy_decode_matches_unsharded():
    """Inference DP: batch-sharded KV-cached decode == single-device decode."""
    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, 80, 8))
    lengths = jnp.full((8,), 80, jnp.int32)
    enc_out, enc_mask = model.encode(params, feats, lengths)
    ref, ref_len = greedy_decode(
        model, params, enc_out, enc_mask, max_length=8,
        bos_id=0, eos_id=1, pad_id=2,
    )

    mesh = make_mesh(("data",))
    sharded_params = jax.device_put(params, replicated_sharding(mesh))
    enc_s = jax.device_put(enc_out, batch_sharding(mesh))
    mask_s = jax.device_put(enc_mask, batch_sharding(mesh))
    out, out_len = greedy_decode(
        model, sharded_params, enc_s, mask_s, max_length=8,
        bos_id=0, eos_id=1, pad_id=2,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(out_len))
