"""ONNX Runtime backend — exact-parity path (requires onnxruntime +
tokenizers wheels and a staged model directory; absent in this sandbox,
so the module import-guards and the hash backend takes over).

Mirrors the reference's execution model, re-expressed for executors:
- session construction with dtype-suffixed model files
  (reference: lib/informers/models.rb:178-208, lib/informers/utils/dtypes.rb:3-12)
- feeds exactly the session's declared inputs
  (reference: lib/informers/models.rb:653-663)
- one InferenceSession per python worker process (executor-singleton),
  the distributed analog of the reference's file cache
  (reference: lib/informers/utils/hub.rb:70-104)

On a real cluster the model dir ships via spark-submit --py-files (zip)
or a shared mount; $INFORMERS_SPARK_MODEL_DIR points at it.
"""

from __future__ import annotations

import os

import numpy as np

import onnxruntime as ort  # noqa: F401  (import-guarded by caller)
from tokenizers import Tokenizer  # noqa: F401


class OnnxBackend:
    def __init__(
        self,
        model_dir: str | None = None,
        dtype: str = "q8",
        max_tokens: int = 512,
        **_,
    ):
        model_dir = model_dir or os.environ.get("INFORMERS_SPARK_MODEL_DIR")
        if not model_dir or not os.path.isdir(model_dir):
            raise RuntimeError("no model dir staged for OnnxBackend")
        # dtype → file suffix, matching reference: lib/informers/utils/dtypes.rb:3-12
        suffix = {"fp32": "", "fp16": "_fp16", "int8": "_int8", "q8": "_quantized",
                  "uint8": "_uint8", "q4": "_q4", "q4f16": "_q4f16", "bnb4": "_bnb4"}[dtype]
        self.session = ort.InferenceSession(
            os.path.join(model_dir, "onnx", f"model{suffix}.onnx"),
            providers=["CPUExecutionProvider"],
        )
        self.tokenizer = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
        self.tokenizer.enable_padding()
        self.tokenizer.enable_truncation(max_length=max_tokens)
        self.dim = int(self.session.get_outputs()[0].shape[-1])
        self._input_names = {i.name for i in self.session.get_inputs()}

    def _run(self, encodings, output_names=None):
        feed = {}
        ids = np.array([e.ids for e in encodings], dtype=np.int64)
        mask = np.array([e.attention_mask for e in encodings], dtype=np.int64)
        if "input_ids" in self._input_names:
            feed["input_ids"] = ids
        if "attention_mask" in self._input_names:
            feed["attention_mask"] = mask
        if "token_type_ids" in self._input_names:
            feed["token_type_ids"] = np.array(
                [e.type_ids for e in encodings], dtype=np.int64
            )
        outs = self.session.run(output_names, feed)
        return outs, mask

    def encode(self, texts: list[str]):
        enc = self.tokenizer.encode_batch(texts)
        outs, mask = self._run(enc)
        return outs[0].astype(np.float32), mask

    def token_classify(self, texts: list[str]):
        enc = self.tokenizer.encode_batch(texts)
        outs, _ = self._run(enc)
        id2label = getattr(self, "id2label", None) or [
            str(i) for i in range(outs[0].shape[-1])
        ]
        logits, offsets = [], []
        for i, e in enumerate(enc):
            n = sum(e.attention_mask)
            logits.append(outs[0][i, :n].astype(np.float32))
            offsets.append(
                [(self.tokenizer.decode([tid]), s, t)
                 for tid, (s, t) in zip(e.ids[:n], e.offsets[:n])]
            )
        return logits, offsets, id2label

    def classify(self, texts: list[str]):
        enc = self.tokenizer.encode_batch(texts)
        outs, _ = self._run(enc)
        id2label = getattr(self, "id2label", None) or [
            str(i) for i in range(outs[0].shape[-1])
        ]
        return outs[0].astype(np.float32), id2label

    def classify_pairs(self, texts: list[str], pairs: list[str]):
        enc = self.tokenizer.encode_batch(list(zip(texts, pairs)))
        outs, _ = self._run(enc)
        label2id = getattr(self, "label2id", {"contradiction": 0, "entailment": 2})
        return outs[0].astype(np.float32), label2id

    def rerank(self, queries: list[str], docs: list[str]) -> np.ndarray:
        enc = self.tokenizer.encode_batch(list(zip(queries, docs)))
        outs, _ = self._run(enc)
        return outs[0][:, 0].astype(np.float32)

    def qa_logits(self, question: str, context: str, toks):
        """QA models emit (start_logits, end_logits)
        (reference: lib/informers/models.rb:1541-1549)."""
        enc = self.tokenizer.encode_batch([(question, context)])
        outs, _ = self._run(enc)
        if len(outs) < 2:
            raise RuntimeError("staged model does not expose start/end logits")
        n = sum(enc[0].attention_mask)
        return outs[0][0, :n].astype(np.float32), outs[1][0, :n].astype(np.float32)

    def mask_logits(self, text: str, mask_token: str):
        """MaskedLM vocab logits at the mask position
        (reference: lib/informers/models.rb:1532-1539,
        pipelines.rb:289-296)."""
        enc = self.tokenizer.encode_batch([text])
        ids = enc[0].ids
        mask_id = self.tokenizer.token_to_id(mask_token)
        if mask_id is None or mask_id not in ids:
            raise ValueError("Mask token not found in text")
        outs, _ = self._run(enc)
        pos = ids.index(mask_id)
        logits = outs[0][0, pos].astype(np.float32)
        vocab = [self.tokenizer.id_to_token(i) or "" for i in range(len(logits))]
        return vocab, logits
