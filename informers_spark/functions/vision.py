"""Vision/audio preprocessing + post-processing kernels (pure numpy).

Reference-parity semantics from lib/informers/processors.rb (the image
preprocess chain: resize -> thumbnail -> center_crop -> rescale ->
normalize -> pad -> HWC->CHW) and lib/informers/utils/image.rb
(RawImage ops). The reference mutates flat Ruby pixel arrays in scalar
loops over libvips buffers; here each step is a vectorized numpy
transform over an HWC array inside an Arrow-batched UDF — no vips/PIL
needed for the math (decode itself lives in operators/multimodal.py).

One documented divergence: the reference resizes via vips
`affine(..., interpolate: bilinear)` (utils/image.rb:30-45), whose edge
sampling is vips-specific; we use the half-pixel bilinear `interpolate`
kernel (functions/kernels.py, itself exact parity with the reference's
own tensor interpolate, utils/math.rb:3-71) — the same kernel the
reference uses for all tensor-space resizes (depth, segmentation masks).
"""

from __future__ import annotations

import numpy as np

from informers_spark.functions.kernels import interpolate, sigmoid, softmax


def calculate_reflect_offset(i, w):
    """Symmetric-pad index reflection (reference: lib/informers/utils/core.rb:7-9):
    abs((i + w) % (2*w) - w). Vectorized — `i` may be an ndarray."""
    i = np.asarray(i)
    return np.abs((i + w) % (2 * w) - w)


def get_resize_output_image_size(
    src_width: int,
    src_height: int,
    size,
    max_size=None,
    do_thumbnail: bool = False,
) -> tuple[int, int]:
    """Target (width, height) for the resize step — exact port of the
    shortest/longest-edge arithmetic in processors.rb:153-212 including
    the `round(2).floor` float-precision guard.

    size: int (shortest edge) | {"shortest_edge","longest_edge"} |
          {"width","height"}; max_size mirrors @config["max_size"].
    """
    shortest_edge = None
    longest_edge = None
    if do_thumbnail:
        # Donut: shortest edge = min(height, width) (processors.rb:158-161)
        shortest_edge = min(size["height"], size["width"])
    elif isinstance(size, (int, float)):
        shortest_edge = size
        longest_edge = max_size if max_size is not None else size
    elif size is not None and "shortest_edge" in size:
        shortest_edge = size.get("shortest_edge")
        longest_edge = size.get("longest_edge")

    if shortest_edge is not None or longest_edge is not None:
        short_factor = (
            1.0
            if shortest_edge is None
            else max(shortest_edge / float(src_width), shortest_edge / float(src_height))
        )
        new_w = src_width * short_factor
        new_h = src_height * short_factor
        long_factor = (
            1.0
            if longest_edge is None
            else min(longest_edge / float(new_w), longest_edge / float(new_h))
        )
        # round to 2 decimals then floor (processors.rb:192-194)
        final_w = int(np.floor(round(new_w * long_factor, 2)))
        final_h = int(np.floor(round(new_h * long_factor, 2)))
        return final_w, final_h
    if size is not None and size.get("width") is not None and size.get("height") is not None:
        return int(size["width"]), int(size["height"])
    raise ValueError("unsupported size spec (reference raises Todo, processors.rb:211)")


def thumbnail_size(
    in_width: int, in_height: int, out_width: int, out_height: int
) -> tuple[int, int]:
    """Donut thumbnail target (width, height): resize to the smaller of
    input/output per edge, preserving aspect via floor
    (processors.rb:45-65)."""
    height = min(in_height, out_height)
    width = min(in_width, out_width)
    if height == in_height and width == in_width:
        return in_width, in_height
    if in_height > in_width:
        width = int(np.floor(in_width * height / in_height))
    elif in_width > in_height:
        height = int(np.floor(in_height * width / in_width))
    return width, height


def resize_hwc(hwc: np.ndarray, out_width: int, out_height: int) -> np.ndarray:
    """Bilinear resize of an HWC array via the CHW interpolate kernel."""
    chw = np.ascontiguousarray(hwc.transpose(2, 0, 1)).astype(np.float64)
    return interpolate(chw, out_height, out_width).transpose(1, 2, 0)


def center_crop(hwc: np.ndarray, crop_width: int, crop_height: int) -> np.ndarray:
    """Center crop, floor offsets (reference: utils/image.rb:47-71 —
    only the crop-within-image branch is implemented upstream; larger
    crops raise Todo there, ValueError here)."""
    h, w = hwc.shape[:2]
    if w == crop_width and h == crop_height:
        return hwc
    woff = (w - crop_width) / 2.0
    hoff = (h - crop_height) / 2.0
    if woff >= 0 and hoff >= 0:
        x0, y0 = int(np.floor(woff)), int(np.floor(hoff))
        return hwc[y0 : y0 + crop_height, x0 : x0 + crop_width]
    raise ValueError("crop larger than image (reference raises Todo, image.rb:66-69)")


def pad_image(
    hwc: np.ndarray,
    pad_width: int,
    pad_height: int,
    mode: str = "constant",
    center: bool = False,
    constant_values=0,
) -> np.ndarray:
    """Pad to (pad_height, pad_width): top-left anchored unless `center`;
    constant fill (scalar or per-channel cycling array) or symmetric
    reflection via calculate_reflect_offset — processors.rb:67-145."""
    h, w, c = hwc.shape
    if pad_width == w and pad_height == h:
        return hwc
    if isinstance(constant_values, (list, tuple, np.ndarray)):
        # cycle the fill values across channels (processors.rb:90-94 uses
        # constant_values[i % channels]; modulo len() here so lists
        # shorter than the channel count cycle instead of crashing)
        cv = np.asarray(constant_values, dtype=np.float64)
        fill = cv[np.arange(c) % len(cv)]
        out = np.tile(fill[None, None, :], (pad_height, pad_width, 1))
    else:
        out = np.full((pad_height, pad_width, c), float(constant_values))
    if center:
        if mode == "symmetric":
            raise ValueError(
                "`center` padding is not supported when `mode` is `symmetric` "
                "(processors.rb:118-120)"
            )
        left = int(np.floor((pad_width - w) / 2.0))
        top = int(np.floor((pad_height - h) / 2.0))
    else:
        left, top = 0, 0
    out[top : top + h, left : left + w] = hwc
    if mode == "symmetric":
        ys = calculate_reflect_offset(np.arange(pad_height), h - 1)
        xs = calculate_reflect_offset(np.arange(pad_width), w - 1)
        reflected = hwc[ys[:, None], xs[None, :]]
        keep = np.zeros((pad_height, pad_width), dtype=bool)
        keep[:h, :w] = True  # do not overwrite the original image
        out = np.where(keep[:, :, None], out, reflected)
    return out


def swin2sr_pad(hwc: np.ndarray, pad_size: int) -> np.ndarray:
    """Swin2SR pad preset (processors.rb:369-391): pad width/height UP to
    the next multiple of pad_size (the sliding-window size for local
    attention) with symmetric reflection, top-left anchored. Padding is
    added only when the dimension is not already a multiple — the
    reference deliberately diverges from the original python there
    (upstream swin2sr bug, PR mv-lab/swin2sr#19, cited in the Ruby)."""
    h, w, _ = hwc.shape
    pad_w = w + (pad_size - w % pad_size) % pad_size
    pad_h = h + (pad_size - h % pad_size) % pad_size
    return pad_image(
        hwc, pad_w, pad_h, mode="symmetric", center=False, constant_values=-1
    )


def donut_pad(
    hwc: np.ndarray,
    pad_width: int,
    pad_height: int,
    image_mean,
    image_std,
) -> np.ndarray:
    """Donut pad preset (processors.rb:393-420): CENTER pad with
    constant_values = -mean/std per channel — normalization runs after
    padding, so these constants normalize to exactly 0 in the padded
    region (the transformers donut behavior the Ruby cites)."""
    c = hwc.shape[2]
    mean = image_mean if isinstance(image_mean, (list, tuple)) else [image_mean] * c
    std = image_std if isinstance(image_std, (list, tuple)) else [image_std] * c
    constant_values = [-m / s for m, s in zip(mean, std)]
    return pad_image(
        hwc, pad_width, pad_height, mode="constant", center=True,
        constant_values=constant_values,
    )


def detr_pixel_mask(batch_size: int, mask_size: tuple[int, int] = (64, 64)) -> np.ndarray:
    """DETR preset (processors.rb:422-444): pixel_mask filled with 1s at
    [batch, 64, 64] — the reference TODOs out variable-size masks and
    always emits all-ones, transcribed faithfully."""
    return np.ones((batch_size,) + tuple(mask_size), dtype=np.int64)


DEFAULT_IMAGE_CONFIG = {
    # mirrors ImageFeatureExtractor config defaults (processors.rb:11-43)
    "do_resize": True,
    "size": {"shortest_edge": 224},
    "do_thumbnail": False,
    "do_center_crop": True,
    "crop_size": 224,
    "do_rescale": True,
    "rescale_factor": 1.0 / 255.0,
    "do_normalize": True,
    "image_mean": [0.485, 0.456, 0.406],
    "image_std": [0.229, 0.224, 0.225],
    "do_pad": False,
    "pad_size": None,
}


def preprocess_image(hwc: np.ndarray, config: dict | None = None) -> dict:
    """Full preprocess chain (processors.rb:219-330): resize ->
    thumbnail -> center_crop -> rescale -> normalize -> pad -> CHW.

    hwc: uint8/float HWC array. Returns {"pixel_values": CHW float64,
    "original_size": (h, w), "reshaped_input_size": (h, w)} — same keys
    as the reference (processors.rb:323-327).
    """
    cfg = dict(DEFAULT_IMAGE_CONFIG)
    if config:
        cfg.update(config)
    src_h, src_w = hwc.shape[:2]
    img = hwc.astype(np.float64)

    if cfg.get("do_resize"):
        w, h = get_resize_output_image_size(
            src_w, src_h, cfg.get("size"), cfg.get("max_size"),
            do_thumbnail=bool(cfg.get("do_thumbnail")),
        )
        img = resize_hwc(img, w, h)
    if cfg.get("do_thumbnail"):
        w, h = thumbnail_size(
            img.shape[1], img.shape[0],
            cfg["size"]["width"], cfg["size"]["height"],
        )
        if (w, h) != (img.shape[1], img.shape[0]):
            img = resize_hwc(img, w, h)
    if cfg.get("do_center_crop"):
        cs = cfg.get("crop_size")
        cw, ch = (cs, cs) if isinstance(cs, int) else (cs["width"], cs["height"])
        img = center_crop(img, cw, ch)

    reshaped = (img.shape[0], img.shape[1])

    if cfg.get("do_rescale"):
        img = img * cfg.get("rescale_factor", 1.0 / 255.0)
    if cfg.get("do_normalize"):
        c = img.shape[2]
        mean = np.asarray(
            cfg["image_mean"] if isinstance(cfg["image_mean"], (list, tuple))
            else [cfg["image_mean"]] * c
        )
        std = np.asarray(
            cfg["image_std"] if isinstance(cfg["image_std"], (list, tuple))
            else [cfg["image_std"]] * c
        )
        if len(mean) != c or len(std) != c:
            raise ValueError(
                f"image_mean ({len(mean)}) and image_std ({len(std)}) must "
                f"match channels ({c})"  # processors.rb:287
            )
        img = (img - mean) / std
    if cfg.get("do_pad") and cfg.get("pad_size"):
        ps = cfg["pad_size"]
        # model-specific pad presets (FeatureExtractor subclass overrides
        # in the reference; chosen by model_type via
        # backend.model_config.pad_preset_for_model_type)
        preset = cfg.get("pad_preset")
        if preset == "swin2sr":
            # pad_size = attention-window size, pad UP to its multiple
            img = swin2sr_pad(img, int(ps))
        elif preset == "donut":
            pw, ph = (ps, ps) if isinstance(ps, int) else (ps["width"], ps["height"])
            img = donut_pad(img, pw, ph, cfg["image_mean"], cfg["image_std"])
        else:
            pw, ph = (ps, ps) if isinstance(ps, int) else (ps["width"], ps["height"])
            img = pad_image(img, pw, ph, mode=cfg.get("pad_mode", "constant"))

    return {
        "pixel_values": np.ascontiguousarray(img.transpose(2, 0, 1)),
        "original_size": (src_h, src_w),
        "reshaped_input_size": reshaped,
    }


def center_to_corners_format(v: np.ndarray) -> np.ndarray:
    """(cx, cy, w, h) -> (x0, y0, x1, y1); vectorized over [..., 4]
    (reference: processors.rb:658-666)."""
    v = np.asarray(v, dtype=np.float64)
    cx, cy, w, h = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return np.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def post_process_object_detection(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    threshold: float = 0.5,
    target_sizes=None,
    is_zero_shot: bool = False,
) -> list[dict]:
    """Reference: processors.rb:668-730, vectorized.

    logits: [batch, num_boxes, num_classes]; pred_boxes: [batch,
    num_boxes, 4] center format. Standard path: per box take argmax
    class, drop background (last class id), score = softmax prob — note
    the reference does NOT apply `threshold` on this path (only the
    zero-shot branch uses it, processors.rb:692-698 vs :700-712; HF
    transformers filters by threshold here — we follow the reference).
    Zero-shot path: sigmoid, keep every class above threshold.
    target_sizes: per-image (h, w) to scale unit boxes — the reference
    multiplies x-coords by width=size[1] and y by height=size[0] via the
    `(i + 1) % 2` trick (processors.rb:719).
    Returns [{boxes, classes, scores}] per image (corner format).
    """
    logits = np.asarray(logits, dtype=np.float64)
    pred_boxes = np.asarray(pred_boxes, dtype=np.float64)
    batch, _num_boxes, num_classes = logits.shape
    if target_sizes is not None and len(target_sizes) != batch:
        raise ValueError("pass as many target sizes as the batch dimension")
    out = []
    for i in range(batch):
        lg = logits[i]
        corners = center_to_corners_format(pred_boxes[i])
        if target_sizes is not None:
            h, w = target_sizes[i]
            corners = corners * np.array([w, h, w, h], dtype=np.float64)
        if is_zero_shot:
            probs = sigmoid(lg)
            bj, kj = np.nonzero(probs > threshold)
            scores = probs[bj, kj]
        else:
            kj = np.argmax(lg, axis=-1)
            probs = softmax(lg, axis=-1)
            scores = probs[np.arange(lg.shape[0]), kj]
            keep = kj != num_classes - 1  # background only; no threshold
            bj, kj, scores = np.nonzero(keep)[0], kj[keep], scores[keep]
        out.append(
            {
                "boxes": corners[bj],
                "classes": kj.astype(np.int64),
                "scores": scores,
            }
        )
    return out


def get_bounding_box(box, as_integer: bool) -> dict:
    """[x0,y0,x1,y1] -> {xmin,ymin,xmax,ymax}; truncate toward zero when
    as_integer (Ruby to_i) — reference pipelines.rb:36-43."""
    if as_integer:
        box = [int(x) for x in box]
    else:
        box = [float(x) for x in box]
    xmin, ymin, xmax, ymax = box
    return {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax}


def zero_mean_unit_var(x: np.ndarray) -> np.ndarray:
    """Audio normalize (x-mean)/sqrt(var + 1e-7), population variance —
    reference Wav2Vec2FeatureExtractor (processors.rb:749-755)."""
    x = np.asarray(x, dtype=np.float64)
    mean = x.mean()
    var = ((x - mean) ** 2).mean()
    return (x - mean) / np.sqrt(var + 1e-7)


# -- segmentation post-processing (processors.rb:446-596) -------------------


def remove_low_and_no_objects(
    class_logits: np.ndarray,
    mask_logits: np.ndarray,
    object_mask_threshold: float,
    num_labels: int,
):
    """Drop background-argmax queries and low-score queries
    (processors.rb:446-473). class_logits: [queries, num_labels+1];
    mask_logits: [queries, H, W]. Returns (mask_probs, scores, labels)."""
    class_logits = np.asarray(class_logits, dtype=np.float64)
    pred = np.argmax(class_logits, axis=-1)
    scores_all = softmax(class_logits, axis=-1)
    sel = []
    for j in range(class_logits.shape[0]):
        if pred[j] == num_labels:  # background
            continue
        if scores_all[j, pred[j]] > object_mask_threshold:
            sel.append(j)
    sel = np.asarray(sel, dtype=np.int64)
    return (
        np.asarray(mask_logits, dtype=np.float64)[sel],
        scores_all[sel, pred[sel]],
        pred[sel],
    )


def compute_segments(
    mask_probs: np.ndarray,
    pred_scores: np.ndarray,
    pred_labels: np.ndarray,
    mask_threshold: float = 0.5,
    overlap_mask_area_threshold: float = 0.8,
    target_size=None,
):
    """Argmax-over-(score*mask) segmentation with tiny-segment validity
    check (processors.rb:475-596). Returns (segmentation [H,W] int array
    of segment ids, 0 = none, [{id, label_id, score}] segments)."""
    mask_probs = np.asarray(mask_probs, dtype=np.float64)
    if len(mask_probs) == 0:
        h, w = target_size if target_size is not None else (0, 0)
        return np.zeros((h, w), dtype=np.int64), []
    if target_size is not None:
        mask_probs = np.stack(
            [
                interpolate(m[None], target_size[0], target_size[1])[0]
                for m in mask_probs
            ]
        )
    h, w = mask_probs.shape[1:]
    segmentation = np.zeros((h, w), dtype=np.int64)
    segments = []
    # weigh each mask by its prediction score (processors.rb:538-554).
    # The reference updates mask_probs IN-PLACE, so every later read of
    # mask_probs (check_segment_validity's original_area) sees the
    # WEIGHTED values — mirror that by using `weighted` below.
    weighted = mask_probs * pred_scores[:, None, None]
    # best_scores starts at 0 and a pixel is claimed only on a STRICT
    # improvement (processors.rb:536,548-551): pixels whose weighted
    # score is ≤ 0 for every query belong to NO query (label -1 here,
    # nil upstream) — plain argmax would credit them to query 0.
    # np.argmax's first-max-wins matches the reference's ascending scan
    # with strict `>` (later ties never overwrite).
    best = weighted.max(axis=0)
    mask_labels = np.where(best > 0, np.argmax(weighted, axis=0), -1)
    current_segment_id = 0
    for k in range(len(pred_labels)):
        mask_k = mask_labels == k
        mask_k_area = int(mask_k.sum())
        # original_area counts the WEIGHTED mask (in-place upstream,
        # processors.rb:485-497 reads mask_probs after the *= score)
        original_area = int((weighted[k] >= mask_threshold).sum())
        mask_exists = mask_k_area > 0 and original_area > 0
        if mask_exists:
            # Ruby integer division parity (check_segment_validity): the
            # reference computes area_ratio with Integer#/, which floors —
            # ratio > 0.8 therefore means mask_k_area > 0.8 * original_area
            # only when the division is exact; we keep float semantics and
            # document the divergence (upstream likely a bug).
            area_ratio = mask_k_area / original_area
            mask_exists = area_ratio > overlap_mask_area_threshold
        if not mask_exists:
            continue
        current_segment_id += 1
        segmentation[mask_k] = current_segment_id
        segments.append(
            {
                "id": current_segment_id,
                "label_id": int(pred_labels[k]),
                "score": float(pred_scores[k]),
            }
        )
    return segmentation, segments
