"""Native checkpoint save/load roundtrip (bf16 + int8 trees)."""

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.ops.quant import quantize_params_int8
from sonicscribe_tpu.tools.convert_weights import load_checkpoint, save_checkpoint


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_array_equal(
            np.asarray(x).view(np.uint8), np.asarray(y).view(np.uint8)
        )


def test_roundtrip_bf16(tmp_path):
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    save_checkpoint(params, cfg, str(tmp_path))
    cfg2, params2, tok = load_checkpoint(str(tmp_path))
    assert cfg2 == cfg
    _trees_equal(params, params2)
    assert tok.vocab_size > 0


def test_roundtrip_int8(tmp_path):
    cfg = tiny()
    params = quantize_params_int8(init_params(cfg, jax.random.PRNGKey(1), jnp.float32))
    save_checkpoint(params, cfg, str(tmp_path))
    _, params2, _ = load_checkpoint(str(tmp_path))
    assert params2["decoder"]["layers"]["qkv_w"]["q"].dtype == jnp.int8
    _trees_equal(params, params2)


def test_hf_dir_guidance(tmp_path):
    (tmp_path / "config.json").write_text("{}")
    try:
        load_checkpoint(str(tmp_path))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "convert" in str(e)


def test_roundtrip_orbax(tmp_path):
    pytest = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")
    from sonicscribe_tpu.tools.convert_weights import save_checkpoint_orbax

    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    save_checkpoint_orbax(params, cfg, str(tmp_path))
    cfg2, params2, _ = load_checkpoint(str(tmp_path))
    assert cfg2 == cfg
    _trees_equal(params, params2)
