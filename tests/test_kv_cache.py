"""Offline unit tests for the KV-cache decoder plumbing
(informers_spark/backend/kv_cache.py) with fabricated arrays and
duck-typed fake sessions — the onnxruntime wheel is absent in this
sandbox, so these pin the pure transforms the reference implements in
models.rb:429-463 (seq2seq_forward), :473-539 (past plumbing) and
:665-689 (decoder_forward)."""

import numpy as np
import pytest

from informers_spark.backend.kv_cache import (
    add_past_key_values,
    cut_input_ids_for_cache,
    decoder_forward,
    empty_past_key_values,
    get_attentions,
    get_past_key_values,
    kv_dims_from_config,
    seq2seq_forward,
    session_run_named,
)


class FakeIO:
    def __init__(self, name):
        self.name = name


class FakeSession:
    """Duck-typed onnxruntime session: declared inputs/outputs + a run fn."""

    def __init__(self, input_names, output_names, run_fn):
        self._inputs = [FakeIO(n) for n in input_names]
        self._outputs = [FakeIO(n) for n in output_names]
        self._run_fn = run_fn
        self.last_feed = None

    def get_inputs(self):
        return self._inputs

    def get_outputs(self):
        return self._outputs

    def run(self, output_names, feed):
        self.last_feed = feed
        return self._run_fn(feed)


# --- pure transforms -------------------------------------------------------


def test_get_past_key_values_maps_present_to_past():
    # present.* -> past_key_values.* via FIRST-occurrence sub
    # (models.rb:476-478 String#sub)
    k = np.ones((1, 2, 3, 4))
    res = {"logits": np.zeros(2), "present.0.key": k, "present.0.value": k * 2}
    pkv = get_past_key_values(res, None)
    assert set(pkv) == {"past_key_values.0.key", "past_key_values.0.value"}
    assert pkv["past_key_values.0.key"] is k


def test_get_past_key_values_optimum_encoder_reuse():
    # with an existing past, encoder slots keep the PREVIOUS tensors —
    # the optimum constant-output optimization (models.rb:481-487)
    old_enc = np.full((1, 2, 5, 4), 7.0)
    prev = {"past_key_values.0.encoder.key": old_enc}
    res = {
        "present.0.encoder.key": np.zeros((1, 2, 0, 4)),  # bogus constant
        "present.0.decoder.key": np.ones((1, 2, 6, 4)),
    }
    pkv = get_past_key_values(res, prev)
    assert pkv["past_key_values.0.encoder.key"] is old_enc
    assert pkv["past_key_values.0.decoder.key"].shape == (1, 2, 6, 4)


def test_get_attentions_indexes_by_layer():
    a0, a1, c0 = np.zeros(1), np.ones(1), np.full(1, 2.0)
    res = {
        "decoder_attentions.1": a1,
        "decoder_attentions.0": a0,
        "cross_attentions.0": c0,
        "logits": np.zeros(2),
    }
    attns = get_attentions(res)
    assert attns["decoder_attentions"][0] is a0
    assert attns["decoder_attentions"][1] is a1
    assert attns["cross_attentions"] == [c0]


def test_empty_past_shapes_encoder_decoder():
    # the shapes the reference's commented-out OrtValue creation
    # describes (models.rb:515-525): [batch, heads, 0, dim_kv]
    feeds = empty_past_key_values(
        batch_size=2,
        is_encoder_decoder=True,
        num_decoder_layers=2,
        num_decoder_heads=8,
        decoder_dim_kv=64,
        num_encoder_heads=4,
        encoder_dim_kv=32,
    )
    assert len(feeds) == 2 * 4
    assert feeds["past_key_values.0.decoder.key"].shape == (2, 8, 0, 64)
    assert feeds["past_key_values.1.encoder.value"].shape == (2, 4, 0, 32)
    assert feeds["past_key_values.0.decoder.key"].dtype == np.float32


def test_empty_past_shapes_decoder_only():
    feeds = empty_past_key_values(batch_size=1, num_layers=3, num_heads=12, dim_kv=64)
    assert len(feeds) == 3 * 2
    assert feeds["past_key_values.2.value"].shape == (1, 12, 0, 64)


def test_add_past_key_values_merges_or_seeds():
    past = {"past_key_values.0.key": np.ones((1, 2, 4, 8))}
    feeds = add_past_key_values({"input_ids": np.zeros((1, 1))}, past)
    assert feeds["past_key_values.0.key"] is past["past_key_values.0.key"]
    feeds2 = add_past_key_values({}, None, batch_size=1, num_layers=1, num_heads=2, dim_kv=8)
    assert feeds2["past_key_values.0.key"].shape == (1, 2, 0, 8)


def test_cut_input_ids_for_cache():
    # after step 0 only the last token is fed (models.rb:607-612)
    assert cut_input_ids_for_cache([3, 5, 9], has_past=True) == [9]
    assert cut_input_ids_for_cache([3, 5, 9], has_past=False) == [3, 5, 9]


def test_kv_dims_from_config_per_family():
    t5 = kv_dims_from_config(
        {"model_type": "t5", "num_decoder_layers": 6, "num_heads": 8, "d_kv": 64}
    )
    assert t5 == {
        "is_encoder_decoder": True,
        "num_decoder_layers": 6,
        "num_decoder_heads": 8,
        "decoder_dim_kv": 64,
        "num_encoder_heads": 8,
        "encoder_dim_kv": 64,
    }
    bart = kv_dims_from_config(
        {
            "model_type": "bart",
            "decoder_layers": 12,
            "decoder_attention_heads": 16,
            "encoder_attention_heads": 16,
            "d_model": 1024,
        }
    )
    assert bart["decoder_dim_kv"] == 64 and bart["num_decoder_layers"] == 12
    gpt2 = kv_dims_from_config(
        {"model_type": "gpt2", "n_head": 12, "n_layer": 12, "n_embd": 768}
    )
    assert gpt2 == {
        "is_encoder_decoder": False,
        "num_layers": 12,
        "num_heads": 12,
        "dim_kv": 64,
    }
    with pytest.raises(ValueError):
        kv_dims_from_config({"model_type": "bert"})


# --- mocked-session forwards ----------------------------------------------


def _decoder_only_session(vocab=5, heads=2, dim=4):
    """A fake merged decoder: logits = position-count ramp; present K/V =
    past K/V extended by one step, so cache growth is observable."""

    def run(feed):
        ids = feed["input_ids"]
        b, s = ids.shape
        past_k = feed["past_key_values.0.key"]
        past_len = past_k.shape[2]
        total = past_len + s
        logits = np.tile(np.arange(vocab, dtype=np.float32) * total, (b, s, 1))
        new_k = np.concatenate(
            [past_k, np.ones((b, heads, s, dim), np.float32)], axis=2
        )
        return [logits, new_k, new_k * 2]

    return FakeSession(
        [
            "input_ids",
            "attention_mask",
            "use_cache_branch",
            "past_key_values.0.key",
            "past_key_values.0.value",
        ],
        ["logits", "present.0.key", "present.0.value"],
        run,
    )


def test_decoder_forward_two_steps_grows_cache():
    sess = _decoder_only_session()
    dims = {"batch_size": 1, "num_layers": 1, "num_heads": 2, "dim_kv": 4}
    out1 = decoder_forward(sess, {"input_ids": [[3, 5]]}, dims=dims)
    # first step: use_cache_branch False, zero-length past fed
    assert sess.last_feed["use_cache_branch"][0] == np.False_
    assert out1["past_key_values"]["past_key_values.0.key"].shape == (1, 2, 2, 4)
    # second step: feed ONLY the new token + the returned past
    out2 = decoder_forward(
        sess,
        {"input_ids": [[7]], "past_key_values": out1["past_key_values"]},
        dims=dims,
    )
    assert sess.last_feed["use_cache_branch"][0] == np.True_
    assert sess.last_feed["past_key_values.0.key"].shape == (1, 2, 2, 4)
    assert out2["past_key_values"]["past_key_values.0.key"].shape == (1, 2, 3, 4)
    # logits reflect the full sequence length (2 past + 1 new)
    assert out2["logits"][0, -1, 1] == pytest.approx(3.0)


def _seq2seq_session():
    def run(feed):
        ids = feed["input_ids"]
        b, s = ids.shape
        enc = feed["encoder_hidden_states"]
        past_len = feed["past_key_values.0.decoder.key"].shape[2]
        logits = np.full((b, s, 4), float(past_len + s + enc.shape[1]), np.float32)
        dec_k = np.concatenate(
            [feed["past_key_values.0.decoder.key"], np.ones((b, 2, s, 4), np.float32)],
            axis=2,
        )
        enc_k = np.zeros((b, 2, enc.shape[1], 4), np.float32)
        return [logits, dec_k, dec_k, enc_k, enc_k]

    return FakeSession(
        [
            "input_ids",
            "encoder_hidden_states",
            "encoder_attention_mask",
            "use_cache_branch",
            "past_key_values.0.decoder.key",
            "past_key_values.0.decoder.value",
            "past_key_values.0.encoder.key",
            "past_key_values.0.encoder.value",
        ],
        [
            "logits",
            "present.0.decoder.key",
            "present.0.decoder.value",
            "present.0.encoder.key",
            "present.0.encoder.value",
        ],
        run,
    )


def test_seq2seq_forward_encoder_once_and_cache():
    sess = _seq2seq_session()
    dims = {
        "batch_size": 1,
        "is_encoder_decoder": True,
        "num_decoder_layers": 1,
        "num_decoder_heads": 2,
        "decoder_dim_kv": 4,
        "num_encoder_heads": 2,
        "encoder_dim_kv": 4,
    }
    calls = []

    def encoder_forward(mi):
        calls.append(1)
        return np.ones((1, 3, 8), np.float32)  # [B, src_len, D]

    mi = {
        "input_ids": [[1, 2, 3]],
        "attention_mask": [[1, 1, 1]],
        "decoder_input_ids": [[0]],
    }
    out1 = seq2seq_forward(sess, mi, dims=dims, encoder_forward=encoder_forward)
    assert calls == [1]
    assert out1["past_key_values"]["past_key_values.0.decoder.key"].shape == (1, 2, 1, 4)
    # step 2: pass encoder_outputs + past back in; encoder NOT recomputed
    mi2 = {
        "input_ids": [[1, 2, 3]],
        "attention_mask": [[1, 1, 1]],
        "decoder_input_ids": [[2]],
        "encoder_outputs": out1["encoder_outputs"],
        "past_key_values": out1["past_key_values"],
    }
    out2 = seq2seq_forward(sess, mi2, dims=dims, encoder_forward=encoder_forward)
    assert calls == [1]
    assert out2["past_key_values"]["past_key_values.0.decoder.key"].shape == (1, 2, 2, 4)
    # encoder past slots reuse the PREVIOUS tensors (optimum path)
    assert (
        out2["past_key_values"]["past_key_values.0.encoder.key"]
        is out1["past_key_values"]["past_key_values.0.encoder.key"]
    )
    assert out2["cross_attentions"] == []


def test_session_run_named_feeds_declared_inputs_only():
    # the declared-inputs-only feed + missing-input error the reference's
    # encoder_forward/session_run contract implies (models.rb:653-663)
    sess = FakeSession(["a", "b"], ["out"], lambda feed: [feed["a"] + feed["b"]])
    out = session_run_named(sess, {"a": 1, "b": 2, "extra": 99})
    assert out == {"out": 3}
    assert "extra" not in sess.last_feed
    with pytest.raises(RuntimeError, match="expects inputs"):
        session_run_named(sess, {"a": 1})


def test_position_ids_raises_like_upstream_todo():
    sess = FakeSession(
        ["input_ids", "attention_mask", "position_ids"], ["logits"], lambda f: [None]
    )
    with pytest.raises(NotImplementedError, match="position_ids"):
        decoder_forward(sess, {"input_ids": [[1]]}, dims={"batch_size": 1})


def test_greedy_generate_ids_decoder_only_cache_path():
    from informers_spark.backend.kv_cache import greedy_generate_ids

    sess = _decoder_only_session(vocab=5)
    dims = {"batch_size": 1, "num_layers": 1, "num_heads": 2, "dim_kv": 4}
    feeds = []
    orig_run = sess._run_fn

    def spy(feed):
        feeds.append({k: np.asarray(v).shape for k, v in feed.items()})
        return orig_run(feed)

    sess._run_fn = spy
    out = greedy_generate_ids(
        sess, [3, 5], max_new_tokens=3, eos_token_id=None, dims=dims
    )
    # ramp logits always argmax to the top vocab id
    assert out == [3, 5, 4, 4, 4]
    # step 0 feeds the full prompt; later steps feed ONE token + past
    assert feeds[0]["input_ids"] == (1, 2)
    assert feeds[1]["input_ids"] == (1, 1)
    assert feeds[2]["input_ids"] == (1, 1)
    # full-length attention mask every step (decoder_run_beam semantics)
    assert feeds[1]["attention_mask"] == (1, 3)
    assert feeds[2]["attention_mask"] == (1, 4)
    # cache grows: past len 0 -> 2 -> 3
    assert feeds[0]["past_key_values.0.key"] == (1, 2, 0, 4)
    assert feeds[1]["past_key_values.0.key"] == (1, 2, 2, 4)
    assert feeds[2]["past_key_values.0.key"] == (1, 2, 3, 4)


def test_greedy_generate_ids_seq2seq_stops_on_eos():
    from informers_spark.backend.kv_cache import greedy_generate_ids

    sess = _seq2seq_session()
    dims = {
        "batch_size": 1,
        "is_encoder_decoder": True,
        "num_decoder_layers": 1,
        "num_decoder_heads": 2,
        "decoder_dim_kv": 4,
        "num_encoder_heads": 2,
        "encoder_dim_kv": 4,
    }
    calls = []

    def encoder_forward(mi):
        calls.append(1)
        return np.ones((1, 3, 8), np.float32)

    # constant logits -> argmax is token 0 every step; eos=0 stops at once
    out = greedy_generate_ids(
        sess,
        [1, 2, 3],
        max_new_tokens=5,
        eos_token_id=0,
        decoder_start_token_id=2,
        is_seq2seq=True,
        dims=dims,
        encoder_forward=encoder_forward,
    )
    assert out == [2, 0]
    assert calls == [1]  # encoder ran exactly once


def test_decoder_only_checkpoint_derives_kv_dims_without_merged_file(tmp_path, monkeypatch):
    """GPT-style checkpoint whose MAIN session is the decoder (no
    decoder_model_merged file): the constructor must derive _kv_dims from
    config.json (n_layer/n_head/n_embd) so the FIRST generate step can
    seed zero-length past feeds — previously `self._kv_dims or {}` left
    them empty and the session rejected the missing past inputs
    (reference decoder-only slot: models.rb:1090-1096)."""
    import json
    import sys
    import types

    (tmp_path / "onnx").mkdir()
    (tmp_path / "onnx" / "model_quantized.onnx").write_bytes(b"")
    (tmp_path / "tokenizer.json").write_text("{}")
    (tmp_path / "config.json").write_text(
        json.dumps({"model_type": "gpt2", "n_layer": 2, "n_head": 4, "n_embd": 16})
    )

    class _IO:
        def __init__(self, name, shape=(1, 1, 8)):
            self.name, self.shape = name, list(shape)

    created = {}

    class _Sess:
        def __init__(self, path, providers=None):
            self._inputs = [
                _IO("input_ids"), _IO("attention_mask"),
            ] + [
                _IO(f"past_key_values.{i}.{kv}")
                for i in range(2) for kv in ("key", "value")
            ]
            self._outputs = [_IO("logits")] + [
                _IO(f"present.{i}.{kv}")
                for i in range(2) for kv in ("key", "value")
            ]
            created["sess"] = self

        def get_inputs(self):
            return self._inputs

        def get_outputs(self):
            return self._outputs

        def run(self, output_names, feed):
            self.last_feed = feed
            b, t = feed["input_ids"].shape
            past_t = feed["past_key_values.0.key"].shape[2]
            outs = [np.zeros((b, t, 8), dtype=np.float32)]
            outs += [
                np.zeros((b, 4, past_t + t, 4), dtype=np.float32) for _ in range(4)
            ]
            return outs

    class _Tok:
        @staticmethod
        def from_file(path):
            return _Tok()

        def enable_padding(self, **kw):
            pass

        def enable_truncation(self, **kw):
            pass

    monkeypatch.setitem(
        sys.modules, "onnxruntime", types.SimpleNamespace(InferenceSession=_Sess)
    )
    monkeypatch.setitem(
        sys.modules, "tokenizers", types.SimpleNamespace(Tokenizer=_Tok)
    )
    import importlib

    import informers_spark.backend as _bk

    sys.modules.pop("informers_spark.backend.onnx_backend", None)
    if hasattr(_bk, "onnx_backend"):
        delattr(_bk, "onnx_backend")  # stale attr would shadow the re-import
    try:
        onnx_backend = importlib.import_module("informers_spark.backend.onnx_backend")

        b = onnx_backend.OnnxBackend(str(tmp_path))
        assert b.decoder_session is None  # no merged file staged
        assert b._kv_dims == {
            "is_encoder_decoder": False, "num_layers": 2, "num_heads": 4, "dim_kv": 4,
        }
        out = b.decoder_forward(
            {"input_ids": np.array([[5, 6]]), "attention_mask": np.array([[1, 1]])}
        )
        # first step fed zero-length past tensors and got a cache back
        assert created["sess"].last_feed["past_key_values.0.key"].shape == (1, 4, 0, 4)
        assert out["past_key_values"]["past_key_values.1.value"].shape == (1, 4, 2, 4)
    finally:
        sys.modules.pop("informers_spark.backend.onnx_backend", None)
        if hasattr(_bk, "onnx_backend"):
            delattr(_bk, "onnx_backend")


def test_mask_generation_checkpoint_loads_session_pair(tmp_path, monkeypatch):
    """MaskGeneration (SAM) loading parity: config-driven dispatch must
    construct the vision_encoder + prompt_encoder_mask_decoder session
    PAIR (reference models.rb:154-158) — no tokenizer, no model.onnx —
    and the prompt decoder must be fed declared-inputs-only."""
    import json
    import sys
    import types

    (tmp_path / "onnx").mkdir()
    (tmp_path / "onnx" / "vision_encoder_quantized.onnx").write_bytes(b"")
    (tmp_path / "onnx" / "prompt_encoder_mask_decoder_quantized.onnx").write_bytes(b"")
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "sam"}))

    class _IO:
        def __init__(self, name, shape=(1, 256, 64, 64)):
            self.name, self.shape = name, list(shape)

    created = []

    class _Sess:
        def __init__(self, path, providers=None):
            self.path = path
            if "vision_encoder" in path:
                self._inputs = [_IO("pixel_values")]
                self._outputs = [_IO("image_embeddings", (1, 256, "h", "w"))]
            else:
                self._inputs = [
                    _IO("image_embeddings"), _IO("input_points"), _IO("input_labels"),
                ]
                self._outputs = [_IO("masks"), _IO("iou_scores")]
            created.append(self)

        def get_inputs(self):
            return self._inputs

        def get_outputs(self):
            return self._outputs

        def run(self, output_names, feed):
            self.last_feed = feed
            if "vision_encoder" in self.path:
                b = feed["pixel_values"].shape[0]
                return [np.zeros((b, 256, 4, 4), dtype=np.float32)]
            return [np.zeros((1, 1, 3, 8, 8), np.float32), np.zeros((1, 1, 3), np.float32)]

    monkeypatch.setitem(
        sys.modules, "onnxruntime", types.SimpleNamespace(InferenceSession=_Sess)
    )
    monkeypatch.setitem(
        sys.modules,
        "tokenizers",
        types.SimpleNamespace(Tokenizer=types.SimpleNamespace(from_file=None)),
    )
    import importlib

    import informers_spark.backend as _bk

    sys.modules.pop("informers_spark.backend.onnx_backend", None)
    if hasattr(_bk, "onnx_backend"):
        delattr(_bk, "onnx_backend")  # stale attr would shadow the re-import
    try:
        onnx_backend = importlib.import_module("informers_spark.backend.onnx_backend")

        b = onnx_backend.OnnxBackend(str(tmp_path))
        assert b.model_type == "sam" and b.tokenizer is None
        assert [("vision" in s.path, "prompt" in s.path) for s in created] == [
            (True, False), (False, True),
        ]
        emb = b.sam_image_embeddings(np.zeros((1, 3, 1024, 1024), np.float32))
        assert emb.shape == (1, 256, 4, 4)
        outs = b.sam_mask_forward(
            {
                "image_embeddings": emb,
                "input_points": np.zeros((1, 1, 1, 2), np.float32),
                "input_labels": np.ones((1, 1, 1), np.int64),
                "not_an_input": np.zeros(1),  # must be filtered out
            }
        )
        assert len(outs) == 2
        assert "not_an_input" not in created[1].last_feed
        # missing declared input -> loud failure, not a silent default
        with pytest.raises(RuntimeError, match="expects inputs"):
            b.sam_mask_forward({"image_embeddings": emb})
    finally:
        sys.modules.pop("informers_spark.backend.onnx_backend", None)
        if hasattr(_bk, "onnx_backend"):
            delattr(_bk, "onnx_backend")


def test_onnx_encode_output_names_passthrough_and_validation(monkeypatch):
    # offline wiring test for the model_output path (pipelines.rb:836-852):
    # encode(output_names=...) must forward the names to session.run and
    # reject undeclared names like the reference's unexpected-outputs
    # Error — onnxruntime is absent here, so stub the module and build
    # the backend shell via __new__ (no session construction)
    import sys
    import types

    for mod in ("onnxruntime", "tokenizers"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            if mod == "tokenizers":
                stub.Tokenizer = object
            monkeypatch.setitem(sys.modules, mod, stub)
    from informers_spark.backend.onnx_backend import OnnxBackend

    class Enc:
        ids = [1, 2]
        attention_mask = [1, 1]
        type_ids = [0, 0]

    class Tok:
        def encode_batch(self, texts):
            return [Enc() for _ in texts]

    captured = {}

    class Sess:
        def run(self, output_names, feed):
            captured["names"] = output_names
            return [np.zeros((len(feed["input_ids"]), 2), dtype=np.float32)]

    be = OnnxBackend.__new__(OnnxBackend)
    be.tokenizer = Tok()
    be.session = Sess()
    be._input_names = {"input_ids", "attention_mask"}
    be._output_names = ["logits", "sentence_embedding"]

    out, mask = be.encode(["x"], output_names=["sentence_embedding"])
    assert captured["names"] == ["sentence_embedding"]
    assert out.shape == (1, 2) and mask.shape == (1, 2)

    with pytest.raises(ValueError, match="unexpected outputs"):
        be.encode(["x"], output_names=["nope"])
