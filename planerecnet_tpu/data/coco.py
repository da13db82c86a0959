"""Minimal COCO-format annotation reader with mask decoding.

Replaces the reference's ``pycocotools`` dependency (reference
data/datasets.py:28-31, 87-89) with a self-contained implementation:
JSON index + polygon rasterisation (cv2.fillPoly) + COCO compressed/
uncompressed RLE decoding (the public LEB128-style RLE string format).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _decode_rle_counts(s: str) -> List[int]:
    """Decode a COCO compressed-RLE counts string (6-bit varint with sign
    extension and delta coding for runs past the first two)."""
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(rle: Dict) -> np.ndarray:
    """Decode an RLE segmentation dict to a (H, W) uint8 mask.

    Accepts compressed (str counts) and uncompressed (list counts) RLE.
    COCO RLE is column-major: counts alternate runs of 0s and 1s down the
    columns. Uses the C codec (planerecnet_tpu/native/rle.c) when available,
    falling back to pure python.
    """
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        native = _native_decode(counts)
        counts = native if native is not None else _decode_rle_counts(counts)

    mask = _native_fill(counts, h, w)
    if mask is not None:
        return mask
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape(w, h).T  # column-major -> (H, W)


def _native_decode(s):
    try:
        from planerecnet_tpu.native import rle_decode_counts_native
        return rle_decode_counts_native(s)
    except Exception:
        return None


def _native_fill(counts, h, w):
    try:
        from planerecnet_tpu.native import rle_fill_native
        return rle_fill_native(counts, h, w)
    except Exception:
        return None


def mask_to_rle(mask: np.ndarray) -> Dict:
    """Encode a (H, W) binary mask as uncompressed column-major RLE.

    Uses the C codec (planerecnet_tpu/native/rle.c::rle_encode_mask) when
    available, falling back to a vectorised numpy scan.
    """
    h, w = mask.shape
    native = _native_encode(mask)
    if native is not None:
        return {"size": [h, w], "counts": native}
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    # run-length encode, starting with a (possibly zero-length) 0-run.
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def _native_encode(mask):
    try:
        from planerecnet_tpu.native import rle_encode_mask_native
        return rle_encode_mask_native(mask)
    except Exception:
        return None


def _encode_rle_counts(counts) -> str:
    """Encode runs as a COCO compressed counts string — the exact inverse of
    ``_decode_rle_counts`` (the public 6-bit-varint format with delta coding
    for runs past the first two), so dumped detections are consumable by
    pycocotools-based external scorers."""
    chars: List[str] = []
    counts = [int(c) for c in counts]
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5  # arithmetic shift: sign-fills for negative deltas
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            chars.append(chr(c + 48))
    return "".join(chars)


def mask_to_compressed_rle(mask: np.ndarray) -> Dict:
    """Encode a (H, W) binary mask as COCO compressed RLE (string counts),
    the format pycocotools' ``encode`` emits and external scorers expect."""
    rle = mask_to_rle(mask)
    return {"size": rle["size"], "counts": _encode_rle_counts(rle["counts"])}


def polygons_to_mask(polys: List[List[float]], h: int, w: int) -> np.ndarray:
    """Rasterise COCO polygon segmentation to a (H, W) uint8 mask."""
    mask = np.zeros((h, w), dtype=np.uint8)
    pts = [np.asarray(p, dtype=np.float64).reshape(-1, 2)
           for p in polys if len(p) >= 6]
    if pts and cv2 is not None:
        cv2.fillPoly(mask, [np.round(p).astype(np.int32) for p in pts], 1)
    return mask


class COCO:
    """Tiny pycocotools.coco.COCO work-alike over a COCO-format JSON file."""

    def __init__(self, annotation_file: Optional[str] = None):
        self.dataset: Dict = {}
        self.anns: Dict[int, Dict] = {}
        self.imgs: Dict[int, Dict] = {}
        self.cats: Dict[int, Dict] = {}
        self.imgToAnns: Dict[int, List[Dict]] = defaultdict(list)
        if annotation_file is not None:
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            self._create_index()

    def _create_index(self):
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.imgToAnns[ann["image_id"]].append(ann)
        self.imgToAnns = dict(self.imgToAnns)

    def getAnnIds(self, imgIds=None) -> List[int]:
        if imgIds is None:
            return list(self.anns.keys())
        if not isinstance(imgIds, (list, tuple)):
            imgIds = [imgIds]
        out = []
        for i in imgIds:
            out.extend(a["id"] for a in self.imgToAnns.get(i, []))
        return out

    def loadAnns(self, ids) -> List[Dict]:
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids) -> List[Dict]:
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def annToMask(self, ann: Dict) -> np.ndarray:
        """Decode an annotation's segmentation to a (H, W) uint8 mask
        (pycocotools-compatible surface used at reference datasets.py:87)."""
        img = self.imgs[ann["image_id"]]
        h, w = img["height"], img["width"]
        seg = ann["segmentation"]
        if isinstance(seg, list):
            return polygons_to_mask(seg, h, w)
        if isinstance(seg, dict):
            return rle_to_mask(seg)
        raise TypeError(f"unsupported segmentation type {type(seg)}")
