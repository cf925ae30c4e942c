import numpy as np
import pytest

from detectron2_tpu.data import transforms as T


def test_resize_shortest_edge():
    aug = T.ResizeShortestEdge(short_edge_length=[100], max_size=200, sample_style="choice")
    img = np.zeros((50, 400, 3), np.uint8)
    out, tfms = T.apply_augmentations([aug], img.copy())
    # shortest edge scaled toward 100 but capped by max_size 200: scale = 200/400
    assert out.shape[:2] == (25, 200)


def test_resize_coords_consistency():
    tfm = T.ResizeTransform(100, 200, 50, 100)
    coords = np.array([[20.0, 10.0], [200.0, 100.0]])
    out = tfm.apply_coords(coords.copy())
    np.testing.assert_allclose(out, [[10, 5], [100, 50]])
    # inverse roundtrip
    back = tfm.inverse().apply_coords(out)
    np.testing.assert_allclose(back, coords)


def test_hflip_boxes():
    tfm = T.HFlipTransform(width=100)
    box = np.array([[10.0, 20.0, 30.0, 40.0]])
    out = tfm.apply_box(box)
    np.testing.assert_allclose(out, [[70, 20, 90, 40]])


def test_random_flip_deterministic_transform():
    aug = T.RandomFlip(prob=1.0)
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    aug_input = T.AugInput(img)
    tfm = aug(aug_input)
    assert isinstance(tfm, T.HFlipTransform)
    np.testing.assert_array_equal(aug_input.image, img[:, ::-1])


def test_crop_and_pad_inverse():
    crop = T.CropTransform(10, 5, 50, 40, orig_w=100, orig_h=80)
    img = np.random.RandomState(0).randint(0, 255, (80, 100, 3)).astype(np.uint8)
    cropped = crop.apply_image(img)
    assert cropped.shape[:2] == (40, 50)
    restored = crop.inverse().apply_image(cropped)
    assert restored.shape[:2] == (80, 100)
    np.testing.assert_array_equal(restored[5:45, 10:60], cropped)


def test_rotation_transform_coords():
    tfm = T.RotationTransform(100, 100, angle=90, expand=True)
    # 90 deg rotation of a square image maps (x, y) -> (y, W-1-x) modulo center conventions
    img = np.zeros((100, 100), np.uint8)
    img[10, 20] = 255
    out = tfm.apply_image(img)
    assert out.shape == (100, 100)
    coords = tfm.apply_coords(np.array([[20.0, 10.0]]))
    ys, xs = np.nonzero(out)
    # transformed pixel is near the transformed coordinate
    assert abs(coords[0][0] - xs[0]) <= 2 and abs(coords[0][1] - ys[0]) <= 2


def test_augmentation_list_composes():
    augs = [T.ResizeShortestEdge([64], 128, "choice"), T.RandomFlip(prob=1.0)]
    img = np.zeros((32, 64, 3), np.uint8)
    boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
    aug_input = T.AugInput(img, boxes=boxes)
    tfms = T.AugmentationList(augs)(aug_input)
    assert len(tfms.transforms) == 2
    assert aug_input.image.shape[:2] == (64, 128)
    # box went through resize (2x) then hflip
    np.testing.assert_allclose(aug_input.boxes, [[108, 0, 128, 20]])


def test_resize_scale_lsj():
    aug = T.ResizeScale(min_scale=0.5, max_scale=0.5, target_height=100, target_width=100)
    img = np.zeros((200, 100, 3), np.uint8)
    out, _ = T.apply_augmentations([aug], img.copy())
    # target 50x50 scaled output: min(50/200, 50/100)=0.25 -> 50x25
    assert out.shape[:2] == (50, 25)


def test_fixed_size_crop_pads():
    aug = T.FixedSizeCrop(crop_size=(64, 64), pad_value=7)
    img = np.zeros((32, 32, 3), np.uint8)
    out, _ = T.apply_augmentations([aug], img.copy())
    assert out.shape[:2] == (64, 64)
    assert (out[40:, 40:] == 7).all()


def test_blend_brightness():
    aug = T.RandomBrightness(0.5, 0.5)
    img = np.full((4, 4, 3), 100, np.uint8)
    out, _ = T.apply_augmentations([aug], img.copy())
    np.testing.assert_allclose(out, 50, atol=1)


def test_resize_uint8_matches_pil_antialiased():
    """uint8 resize must be pixel-exact with PIL (the reference's
    transform.py:117-124 path): PIL's BILINEAR antialiases on downscale,
    where cv2's INTER_LINEAR diverges by up to ~60/255 — an AP-relevant
    preprocessing difference."""
    from PIL import Image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (320, 280, 3), np.uint8)
    for new_h, new_w in [(256, 224), (480, 420)]:
        t = T.ResizeTransform(320, 280, new_h, new_w)
        ours = t.apply_image(img)
        ref = np.asarray(Image.fromarray(img).resize((new_w, new_h), Image.BILINEAR))
        np.testing.assert_array_equal(ours, ref)
    # nearest used for segmentation labels
    seg = rng.randint(0, 20, (320, 280), np.uint8)
    t = T.ResizeTransform(320, 280, 160, 140)
    np.testing.assert_array_equal(
        t.apply_segmentation(seg),
        np.asarray(Image.fromarray(seg).resize((140, 160), Image.NEAREST)),
    )
