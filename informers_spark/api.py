"""Reference-shaped API facade.

The reference's entry point is `Informers.pipeline(task, model)` → a
callable over strings (reference: lib/informers/pipelines.rb:1355-1425,
SUPPORTED_TASKS registry at :1083-1327, aliases at :1329-1333). Here a
task name resolves to a DataFrame → DataFrame transform, so a reference
user's `pipeline("ner").("text")` becomes `pipeline("ner")(df)`.

Task registry mirrors the reference's 22-task SUPPORTED_TASKS surface;
tasks that raise Todo upstream (automatic-speech-recognition's whisper
path, pipelines.rb:985-987) raise NotImplementedError with the citation.
"""

from __future__ import annotations

from functools import partial

from informers_spark.pipelines.audio import (
    audio_classify,
    text_to_audio,
    zero_shot_audio_classify,
)
from informers_spark.pipelines.classify import classify, zero_shot
from informers_spark.pipelines.embed import embed
from informers_spark.pipelines.generate import generate_text, summarize, translate
from informers_spark.pipelines.ner import ner
from informers_spark.pipelines.qa import fill_mask, question_answering
from informers_spark.pipelines.rerank import rerank
from informers_spark.pipelines.vision import (
    depth_estimate,
    document_qa,
    image_classify,
    image_feature_extract,
    image_segment,
    image_to_image,
    image_to_text,
    object_detect,
    zero_shot_image_classify,
    zero_shot_object_detect,
)

# reference alias map (pipelines.rb:1329-1333)
TASK_ALIASES = {
    "sentiment-analysis": "text-classification",
    "ner": "token-classification",
    "text-to-speech": "text-to-audio",
    "embedding": "embedding",
}

SUPPORTED_TASKS = {
    "text-classification": classify,
    "token-classification": ner,
    "question-answering": question_answering,
    "fill-mask": fill_mask,
    "zero-shot-classification": zero_shot,
    # feature-extraction defaults: pooling "none" (per-token vectors) +
    # no normalize (pipelines.rb:824-826) — overridable per call
    "feature-extraction": partial(embed, pooling="none", do_normalize=False),
    # embedding defaults: pooling mean + normalize (pipelines.rb:1042-1051)
    "embedding": partial(embed, pooling="mean", do_normalize=True),
    "reranking": rerank,
    # greedy-decode generation v1 (pipelines.rb:314-418; loop models.rb:214-349)
    "text2text-generation": generate_text,
    "summarization": summarize,
    "translation": translate,
    "text-generation": partial(generate_text, return_full_text=True),
    # vision (pipelines.rb:499-1040; preprocess chain processors.rb:219-330)
    "image-classification": image_classify,
    "image-feature-extraction": image_feature_extract,
    "zero-shot-image-classification": zero_shot_image_classify,
    "object-detection": object_detect,
    "zero-shot-object-detection": zero_shot_object_detect,
    "image-segmentation": image_segment,
    "depth-estimation": depth_estimate,
    "image-to-image": image_to_image,
    "image-to-text": image_to_text,
    "document-question-answering": document_qa,
    # audio (pipelines.rb:801-971)
    "audio-classification": audio_classify,
    "zero-shot-audio-classification": zero_shot_audio_classify,
    "text-to-audio": text_to_audio,
}

_OUT_OF_SCOPE = {
    # task name → reference location: raises Todo UPSTREAM too
    "automatic-speech-recognition": "pipelines.rb:985-987 (call_whisper raises Todo)",
}


def pipeline(task: str, backend: str = "auto", progress_callback=None, **defaults):
    """→ a DataFrame transform fn(df, **overrides) for the task.

    progress_callback: receives the reference's "ready" event once the
    transform is constructed (pipelines.rb:1417-1421); file-level
    initiate/download/progress/done events flow from sources.hub when a
    backend resolves model files through it."""
    task = TASK_ALIASES.get(task, task)
    if task in SUPPORTED_TASKS:
        fn = SUPPORTED_TASKS[task]

        def transform(df, **kwargs):
            merged = {**defaults, **kwargs}
            return fn(df, backend=backend, **merged)

        transform.task = task
        from informers_spark.sources.hub import dispatch_callback

        dispatch_callback(
            progress_callback,
            {"status": "ready", "task": task,
             "model": defaults.get("backend_opts", {}).get("model_dir", backend)},
        )
        return transform
    if task in _OUT_OF_SCOPE:
        raise NotImplementedError(
            f"task '{task}' is out of scope for the KG engine "
            f"(reference: {_OUT_OF_SCOPE[task]})"
        )
    raise ValueError(f"Unsupported pipeline: {task}")


# per-model embed option overrides, mirroring Model#embed's special case
# (reference: lib/informers/model.rb:6 — mxbai wants cls pooling and no
# normalization); extendable the way the reference hardcodes it
MODEL_EMBED_OPTIONS = {
    "mixedbread-ai/mxbai-embed-large-v1": {"pooling": "cls", "do_normalize": False},
}


def embed_texts(df, text_col: str = "text", backend: str = "auto", model_id: str | None = None):
    """Convenience mirroring the legacy Model#embed
    (reference: lib/informers/model.rb:3-13): embedding defaults
    (mean pool + normalize) with per-model overrides applied by id."""
    opts = MODEL_EMBED_OPTIONS.get(model_id, {})
    return embed(df, text_col=text_col, backend=backend, **opts)
