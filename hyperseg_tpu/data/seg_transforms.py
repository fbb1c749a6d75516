"""Paired image/label transforms for semantic segmentation.

Same capability surface as the reference pipeline
(hyperseg/datasets/seg_transforms.py) with the same core semantics —
SegTransform marker class; Compose applies SegTransforms to the (img, lbl)
pair and plain transforms to the image only, recursing over pyramid lists;
bicubic for images, nearest for labels; right/bottom-only constant pad with a
separate label fill — but torchvision-free (pure PIL + numpy + cv2 pyramids)
and emitting NHWC float32 arrays ready for device upload (the TPU layout),
not CHW torch tensors.
"""

from __future__ import annotations

import numbers
import random

import numpy as np
from PIL import Image, ImageFilter, ImageOps

BICUBIC = Image.BICUBIC
NEAREST = Image.NEAREST
BILINEAR = Image.BILINEAR


def call_recursive(f, x):
    return [call_recursive(f, y) for y in x] if isinstance(x, (list, tuple)) else f(x)


class SegTransform:
    """Marker base: transforms of the (image, label) pair."""


class Compose:
    """Compose transforms; SegTransforms see the pair, others the image only
    (recursively over pyramid lists) — seg_transforms.py:23-63."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, *args):
        pair = list(args) if len(args) > 1 else list(args[0])
        assert len(pair) == 2, "expected (image, label)"
        for t in self.transforms:
            if isinstance(t, SegTransform):
                pair = list(t(*pair))
            else:
                pair[0] = call_recursive(t, pair[0])
        return tuple(pair)

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{self.__class__.__name__}(\n{inner}\n)"


# ---------------------------------------------------------------------------
# PIL helpers
# ---------------------------------------------------------------------------


def _to_pil(x, mode=None):
    if isinstance(x, Image.Image):
        return x
    return Image.fromarray(np.asarray(x), mode)


def _pad_pil(img: Image.Image, padding, fill, mode="constant"):
    """torchvision-style pad: padding = int | (lr, tb) | (l, t, r, b)."""
    if isinstance(padding, numbers.Number):
        padding = (padding,) * 4
    elif len(padding) == 2:
        padding = (padding[0], padding[1], padding[0], padding[1])
    l, t, r, b = [int(v) for v in padding]
    if l == t == r == b == 0:
        return img
    if mode == "constant":
        return ImageOps.expand(img, border=(l, t, r, b), fill=fill)
    a = np.asarray(img)
    np_mode = {"edge": "edge", "reflect": "reflect", "symmetric": "symmetric"}[mode]
    cfg = ((t, b), (l, r)) + (((0, 0),) if a.ndim == 3 else ())
    return Image.fromarray(np.pad(a, cfg, mode=np_mode))


def larger_edge_resize(img: Image.Image, size, interpolation=BICUBIC):
    """Resize so the larger edge matches `size` (aspect preserved), or to an
    (h, w) pair (seg_transforms.py:117-147)."""
    if isinstance(size, int):
        w, h = img.size
        if (w >= h and w == size) or (h >= w and h == size):
            return img
        if w < h:
            return img.resize((int(size * w / h), size), interpolation)
        return img.resize((size, int(size * h / w)), interpolation)
    return img.resize(tuple(size[::-1]), interpolation)


# ---------------------------------------------------------------------------
# Terminal transforms (PIL -> numpy NHWC)
# ---------------------------------------------------------------------------


class ToArray(SegTransform):
    """PIL (image, label) -> (float32 HWC in [0,1], int32 HW). The NHWC
    counterpart of the reference's ToTensor (seg_transforms.py:66-85)."""

    def __call__(self, img, lbl):
        def conv(im):
            a = np.asarray(im, dtype=np.float32) / 255.0
            if a.ndim == 2:
                a = a[..., None]
            return a
        return call_recursive(conv, img), np.asarray(lbl).astype(np.int32)

    def __repr__(self):
        return "ToArray()"


# Alias keeping the reference's config name valid.
ToTensor = ToArray


class ToNormalizedArray(SegTransform):
    """Fused ToArray + Normalize in one native pass over the uint8 image
    (hyperseg_tpu/native.normalize_u8): PIL pair -> (normalized float32 HWC,
    int32 HW). Drop-in replacement for [ToArray(), Normalize(mean, std)]."""

    def __init__(self, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, lbl):
        from hyperseg_tpu import native

        def conv(im):
            return native.normalize_u8(np.asarray(im, np.uint8), self.mean,
                                       self.std)
        return call_recursive(conv, img), np.asarray(lbl).astype(np.int32)


class Normalize:
    """Channel normalization on HWC float arrays; default 0.5/0.5
    (seg_transforms.py:88-114)."""

    def __init__(self, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, x):
        return (x - self.mean) / self.std

    def __repr__(self):
        return f"Normalize(mean={self.mean.tolist()}, std={self.std.tolist()})"


class Resize(SegTransform):
    """Deterministic (h, w) resize: bicubic image, nearest label (the
    torchvision Resize used in eval configs, applied pairwise)."""

    def __init__(self, size, interpolation=BICUBIC):
        self.size = tuple(size) if not isinstance(size, int) else size
        self.interpolation = interpolation

    def __call__(self, img, lbl):
        img = larger_edge_resize(img, self.size, self.interpolation)
        lbl = larger_edge_resize(lbl, self.size, NEAREST)
        return img, lbl

    def __repr__(self):
        return f"Resize(size={self.size})"


class LargerEdgeResize(Resize):
    """Alias with the reference's name (seg_transforms.py:150-178)."""


class ConstantPad(SegTransform):
    """Pad right/bottom up to a fixed (w, h) target with separate label fill
    (seg_transforms.py:181-221)."""

    def __init__(self, padding, fill=0, lbl_fill=None, padding_mode="constant"):
        self.padding = padding if not isinstance(padding, numbers.Number) else (padding, padding)
        self.fill = fill
        self.lbl_fill = fill if lbl_fill is None else lbl_fill
        self.padding_mode = padding_mode

    def __call__(self, img, lbl):
        need = np.maximum(np.asarray(self.padding) - np.asarray(img.size), 0)
        padding = (0, 0, int(need[0]), int(need[1]))
        img = _pad_pil(img, padding, self.fill, self.padding_mode)
        lbl = _pad_pil(lbl, padding, self.lbl_fill, self.padding_mode)
        return img, lbl


class RandomResize(SegTransform):
    """Random rescale by a factor from scale_range or scale_values
    (seg_transforms.py:224-246)."""

    def __init__(self, p=0.5, scale_range=None, scale_values=None,
                 interpolation=BICUBIC):
        assert (scale_range is None) ^ (scale_values is None)
        self.p = p
        self.scale_range = scale_range
        self.scale_values = scale_values
        self.interpolation = interpolation

    def __call__(self, img, lbl):
        if random.random() >= self.p:
            return img, lbl
        if self.scale_range is not None:
            lo, hi = self.scale_range
            scale = random.random() * (hi - lo) + lo
        else:
            scale = self.scale_values[random.randrange(len(self.scale_values))]
        w, h = img.size
        size = (int(round(w * scale)), int(round(h * scale)))
        return (img.resize(size, self.interpolation),
                lbl.resize(size, NEAREST))


class RandomCrop(SegTransform):
    """Random (h, w) crop with optional pad-to-fit and label fill
    (seg_transforms.py:249-316)."""

    def __init__(self, size, padding=None, pad_if_needed=False, fill=0,
                 lbl_fill=None, padding_mode="constant"):
        self.size = (size, size) if isinstance(size, numbers.Number) else tuple(size)
        self.padding = padding
        self.pad_if_needed = pad_if_needed
        self.fill = fill
        self.lbl_fill = fill if lbl_fill is None else lbl_fill
        self.padding_mode = padding_mode

    def __call__(self, img, lbl):
        assert img.size == lbl.size
        if self.padding is not None:
            img = _pad_pil(img, self.padding, self.fill, self.padding_mode)
            lbl = _pad_pil(lbl, self.padding, self.lbl_fill, self.padding_mode)
        th, tw = self.size
        # reference pads the full deficit on left/top via a 2-tuple pad
        if self.pad_if_needed and img.size[0] < tw:
            d = tw - img.size[0]
            img = _pad_pil(img, (d, 0), self.fill, self.padding_mode)
            lbl = _pad_pil(lbl, (d, 0), self.lbl_fill, self.padding_mode)
        if self.pad_if_needed and img.size[1] < th:
            d = th - img.size[1]
            img = _pad_pil(img, (0, d), self.fill, self.padding_mode)
            lbl = _pad_pil(lbl, (0, d), self.lbl_fill, self.padding_mode)
        w, h = img.size
        i = random.randint(0, h - th) if h > th else 0
        j = random.randint(0, w - tw) if w > tw else 0
        box = (j, i, j + tw, i + th)
        return img.crop(box), lbl.crop(box)


class RandomHorizontalFlip(SegTransform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, lbl):
        if random.random() < self.p:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
        return img, lbl


class RandomVerticalFlip(SegTransform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, lbl):
        if random.random() < self.p:
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
            lbl = lbl.transpose(Image.FLIP_TOP_BOTTOM)
        return img, lbl


class RandomGaussianBlur:
    """Image-only gaussian blur (seg_transforms.py:361-381)."""

    def __init__(self, p=0.5, r=5):
        self.p = p
        self.filter = ImageFilter.GaussianBlur(radius=r)

    def __call__(self, img):
        if random.random() < self.p:
            img = img.filter(self.filter)
        return img


class RandomRotation(SegTransform):
    """Random rotation: bicubic image, nearest label, separate fills
    (seg_transforms.py:384-426)."""

    def __init__(self, degrees, resample=BICUBIC, expand=False, center=None,
                 fill=None, lbl_fill=None):
        if isinstance(degrees, numbers.Number):
            degrees = (-degrees, degrees)
        self.degrees = degrees
        self.resample = resample
        self.expand = expand
        self.center = center
        self.fill = fill
        self.lbl_fill = fill if lbl_fill is None else lbl_fill

    def __call__(self, img, lbl):
        angle = random.uniform(self.degrees[0], self.degrees[1])
        img = img.rotate(angle, self.resample, self.expand, self.center,
                         fillcolor=self.fill)
        lbl = lbl.rotate(angle, NEAREST, self.expand, self.center,
                         fillcolor=self.lbl_fill)
        return img, lbl


class Pyramids:
    """Image-only gaussian pyramid (cv2.pyrDown, seg_transforms.py:429-457)."""

    def __init__(self, levels=1):
        assert levels >= 1
        self.levels = levels

    def __call__(self, img) -> list:
        import cv2
        pyd = [img]
        for _ in range(self.levels - 1):
            pyd.append(Image.fromarray(cv2.pyrDown(np.array(pyd[-1]))))
        return pyd


class UpDownPyramids(Pyramids):
    """Pyramid plus upsampled levels (cv2.pyrUp, seg_transforms.py:460-486)."""

    def __init__(self, levels=1, up_levels=0):
        super().__init__(levels)
        self.up_levels = up_levels

    def __call__(self, img) -> list:
        import cv2
        pyd = super().__call__(img)
        for _ in range(self.up_levels):
            pyd.append(Image.fromarray(cv2.pyrUp(np.array(pyd[0]))))
        return pyd


def main(input_img, label_img, out="transform_preview.png"):
    """Transform visualization harness (seg_transforms.py:489-544): applies a
    default train pipeline to one (image, label) pair and saves a preview."""
    import numpy as np
    from hyperseg_tpu.utils.img_utils import blend_seg, denormalize, make_grid

    img = Image.open(input_img).convert("RGB")
    lbl = Image.open(label_img)
    tf = Compose([RandomResize(scale_range=(0.5, 1.5)),
                  RandomCrop((256, 256), pad_if_needed=True, lbl_fill=255),
                  RandomHorizontalFlip(), ToArray(), Normalize()])
    a, l = tf(img, lbl)
    base = denormalize(a)
    colors = [(int(37 * i) % 256, int(91 * i) % 256, int(151 * i) % 256)
              for i in range(256)]
    grid = make_grid(base, blend_seg(base, l, colors))
    Image.fromarray((grid * 255).astype(np.uint8)).save(out)
    print(f"saved {out}; image {a.shape}, label {l.shape}")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser("seg_transforms preview")
    p.add_argument("input_img")
    p.add_argument("label_img")
    p.add_argument("-o", "--out", default="transform_preview.png")
    a = p.parse_args()
    main(a.input_img, a.label_img, a.out)


class ImageResize:
    """Image-only (h, w) resize — the role torchvision's Resize plays in the
    reference configs: because it is not a SegTransform, Compose applies it to
    the image only and labels keep their native resolution; metrics then run
    on full-resolution labels against upsampled logits (test.py:167-168)."""

    def __init__(self, size, interpolation=BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        return larger_edge_resize(img, self.size, self.interpolation)

    def __repr__(self):
        return f"ImageResize(size={self.size})"


class ColorJitter:
    """Image-only brightness/contrast/saturation/hue jitter (the torchvision
    ColorJitter used by the reference configs), applied in random order with
    factors uniform in [max(0, 1-v), 1+v] (hue: [-h, h])."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img):
        from PIL import ImageEnhance
        ops = []
        if self.brightness:
            f = random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f2 = random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
        if self.saturation:
            f3 = random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
        if self.hue:
            shift = random.uniform(-self.hue, self.hue)

            def hue_op(im, shift=shift):
                h, s, v = im.convert("HSV").split()
                h = h.point(lambda px: (px + int(shift * 255)) % 256)
                return Image.merge("HSV", (h, s, v)).convert("RGB")
            ops.append(hue_op)
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img

    def __repr__(self):
        return (f"ColorJitter({self.brightness}, {self.contrast}, "
                f"{self.saturation}, {self.hue})")
