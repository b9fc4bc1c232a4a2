import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.bert_padding import pad_input, unpad_input


def test_unpad_pad_roundtrip():
    b, s, d = 3, 64, 16
    lens = [10, 64, 33]
    mask = jnp.asarray(
        np.stack([np.arange(s) < l for l in lens]), jnp.int32
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d), jnp.float32)
    packed, idx, cu, maxlen, segs = unpad_input(x, mask)
    assert packed.shape == (b * s, d)
    assert list(np.asarray(cu)) == [0, 10, 74, 107]
    assert int(maxlen) == 64
    # valid tokens front-packed in order
    assert jnp.allclose(packed[:10], x[0, :10])
    assert jnp.allclose(packed[10:74], x[1])
    assert jnp.allclose(packed[74:107], x[2, :33])
    assert bool(jnp.all(packed[107:] == 0))
    segs = np.asarray(segs)
    assert (segs[:10] == 1).all() and (segs[10:74] == 2).all()
    assert (segs[74:107] == 3).all() and (segs[107:] == 0).all()
    back = pad_input(packed, idx, b, s)
    assert jnp.array_equal(back, x * mask[:, :, None].astype(x.dtype))


def test_unpad_under_jit():
    b, s, d = 2, 32, 8
    mask = jnp.asarray([[1] * 20 + [0] * 12, [1] * 32], jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d), jnp.float32)

    @jax.jit
    def roundtrip(x, mask):
        packed, idx, cu, _, segs = unpad_input(x, mask)
        return pad_input(packed, idx, b, s)

    back = roundtrip(x, mask)
    assert jnp.array_equal(back, x * mask[:, :, None].astype(x.dtype))
