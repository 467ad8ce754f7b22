"""Reference raw-FP32 blob format: layout, round trip, forward equality.

The blob contract is the reference's fixed walk order
(create_param_layers, model.cpp:336-469) — tied embedding/LM-head at offset
0, (2L+1) norms, then wq/wk/wv/wo/up/gate/down groups of L matrices each,
all row-major [out, in] FP32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # blob roundtrip IO

from simplellminference_tpu.core.config import ModelConfig, QuantConfig
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime import raw_blob


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny_test(tie_word_embeddings=True)


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(7))


def test_layout_is_contiguous_and_ordered(cfg):
    ents = raw_blob.blob_layout(cfg)
    pos = 0
    for e in ents:
        assert e.offset == pos, e
        pos += int(np.prod(e.shape))
    assert ents[0].name == "embed"
    assert ents[0].shape == (cfg.vocab_size, cfg.hidden_size)
    # norms come right after the embedding, final norm at index 2L
    assert ents[1].name == "norm.0"
    assert ents[2 * cfg.num_layers + 1].name == f"norm.{2 * cfg.num_layers}"
    # group order: all wq, then all wk, ... (model.cpp:372-462)
    names = [e.name.split(".")[0] for e in ents[2 * cfg.num_layers + 2:]]
    want = [g for g in ("wq", "wk", "wv", "wo", "up", "gate", "down")
            for _ in range(cfg.num_layers)]
    assert names == want
    assert raw_blob.blob_num_floats(cfg) == pos


def test_round_trip_forward_equality(tmp_path, cfg, params):
    path = str(tmp_path / "weights.bin")
    raw_blob.save_reference_blob(path, cfg, params)
    loaded = raw_blob.load_reference_blob(path, cfg)

    tokens = jnp.asarray([[3, 14, 15, 9, 2, 6]], jnp.int32)
    positions = jnp.arange(6, dtype=jnp.int32)[None]
    ref, _ = llama.forward(cfg, params, tokens, positions)
    got, _ = llama.forward(cfg, loaded, tokens, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_size_mismatch_is_hard_error(tmp_path, cfg, params):
    path = str(tmp_path / "weights.bin")
    raw_blob.save_reference_blob(path, cfg, params)
    wrong = ModelConfig.tiny_test(num_layers=3)
    with pytest.raises(ValueError, match="fp32 elements"):
        raw_blob.load_reference_blob(path, wrong)


def test_quantized_load_close_to_fp(tmp_path, cfg, params):
    path = str(tmp_path / "weights.bin")
    raw_blob.save_reference_blob(path, cfg, params)
    qparams = raw_blob.load_reference_blob(
        path, cfg, quant=QuantConfig(mode="int8", group_size=32))
    tokens = jnp.asarray([[3, 14, 15, 9]], jnp.int32)
    positions = jnp.arange(4, dtype=jnp.int32)[None]
    ref, _ = llama.forward(cfg, params, tokens, positions)
    got, _ = llama.forward(cfg, qparams, tokens, positions)
    # int8 weight quantization: logits stay close in fp32 tiny model
    assert jnp.mean(jnp.abs(got - ref)) < 0.15


def test_cli_generates_from_blob(tmp_path, cfg, params, capsys):
    """End-to-end migration path: blob + config.json -> CLI generation."""
    import json

    from simplellminference_tpu.cli import generate as cli

    blob = str(tmp_path / "weights.bin")
    raw_blob.save_reference_blob(blob, cfg, params)
    cfg_json = str(tmp_path / "config.json")
    with open(cfg_json, "w") as f:
        json.dump({
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim, "rms_norm_eps": cfg.rms_norm_eps,
            "rope_theta": cfg.rope_theta, "max_position_embeddings": 128,
            "tie_word_embeddings": True,
        }, f)
    cli.main(["--blob", blob, "--config", cfg_json, "--tokenizer", "bytes",
              "--prompt", "hi", "--max-new-tokens", "4",
              "--dtype", "float32", "--cpu", "--no-stream"])
    out = capsys.readouterr()
    assert "tok/s" in out.err


def test_untied_config_materializes_head(tmp_path, params):
    cfg_untied = ModelConfig.tiny_test(tie_word_embeddings=False)
    # params fixture was built tied; build untied-compatible blob from the
    # tied tree (blob is always tied, Q5) and load with an untied config.
    cfg_tied = ModelConfig.tiny_test(tie_word_embeddings=True)
    path = "/tmp/_blob_untied_test.bin"
    raw_blob.save_reference_blob(path, cfg_tied, params)
    loaded = raw_blob.load_reference_blob(path, cfg_untied)
    assert "lm_head" in loaded
    np.testing.assert_array_equal(np.asarray(loaded["lm_head"]),
                                  np.asarray(loaded["embed"]).T)
