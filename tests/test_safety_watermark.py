"""Safety checker head math + invisible watermark round-trip
(reference: stable-diffusion/utils.py:16-100, runners/base_runner.py:63-96)."""

import numpy as np
import pytest

from sige_tpu.models.sd.safety import (SafetyChecker, convert_safety_head,
                                       cosine_similarity, preprocess_images,
                                       safety_head)
from sige_tpu.utils.watermark import (WatermarkEncoder, bits_to_bytes,
                                      bytes_to_bits, put_watermark)


# ---------------------------------------------------------------- safety
def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_cosine_similarity_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=(3, 8)), rng.normal(size=(5, 8))
    got = np.asarray(cosine_similarity(a, b))
    want = _unit(a) @ _unit(b).T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_safety_head_thresholds_and_adjustment():
    # one concept along e0, one special-care concept along e1
    concept = np.eye(1, 8, 0, dtype=np.float32)       # [1, 8]
    special = np.eye(1, 8, 1, dtype=np.float32)
    c_thr = np.array([0.5], np.float32)
    s_thr = np.array([0.5], np.float32)

    # image A: aligned with the concept -> flagged
    # image B: weakly aligned (cos 0.49 < 0.5) -> clean
    # image C: weakly aligned with the concept (cos 0.495) AND strongly
    #          special-care -> the 0.01 adjustment tips it over
    def vec(c0, c1):
        v = np.zeros(8, np.float32)
        v[0], v[1] = c0, c1
        rest = np.sqrt(max(0.0, 1 - c0 * c0 - c1 * c1))
        v[7] = rest
        return v

    embeds = np.stack([vec(0.9, 0.0), vec(0.49, 0.0), vec(0.495, 0.8)])
    nsfw = safety_head(embeds, concept, c_thr, special, s_thr)
    assert list(nsfw) == [True, False, True]


def test_safety_checker_end_to_end_blackout():
    rng = np.random.default_rng(1)
    D, P = 16, 8
    proj = rng.normal(size=(D, P)).astype(np.float32)
    concept = rng.normal(size=(2, P)).astype(np.float32)
    special = rng.normal(size=(1, P)).astype(np.float32)

    images = rng.random((2, 32, 32, 3)).astype(np.float32)

    # vision_fn crafted so image 0 projects onto concept 0, image 1 is
    # orthogonal to every concept
    # solve pooled @ proj = desired_embed for pooled
    pinv_t = np.linalg.pinv(proj).T  # [D, P]

    def vision_fn(pixel_values):
        assert pixel_values.shape[1:] == (224, 224, 3)
        out = np.zeros((pixel_values.shape[0], D), np.float32)
        out[0] = pinv_t @ _unit(concept[0])
        # last right-singular vector is orthogonal to every concept row
        ortho = np.linalg.svd(np.concatenate([concept, special]))[2][-1]
        out[1] = pinv_t @ ortho
        return out

    checker = SafetyChecker(
        {"concept_embeds": concept,
         "concept_thresholds": np.array([0.9, 0.9], np.float32),
         "special_embeds": special,
         "special_thresholds": np.array([0.9], np.float32),
         "visual_projection": proj},
        vision_fn=vision_fn)
    checked, has_nsfw = checker(images)
    assert has_nsfw == [True, False]
    assert np.all(checked[0] == 0.0)
    np.testing.assert_array_equal(checked[1], images[1])


def test_convert_safety_head_layout():
    sd = {
        "concept_embeds": np.ones((17, 768), np.float32),
        "concept_embeds_weights": np.full((17,), 0.2, np.float32),
        "special_care_embeds": np.ones((3, 768), np.float32),
        "special_care_embeds_weights": np.full((3,), 0.1, np.float32),
        "visual_projection.weight": np.arange(12, dtype=np.float32
                                              ).reshape(4, 3),  # [P, D]
    }
    head = convert_safety_head(sd)
    assert head["visual_projection"].shape == (3, 4)  # transposed to [D, P]
    assert head["concept_embeds"].shape == (17, 768)
    assert head["special_thresholds"].shape == (3,)


def test_preprocess_resizes_and_normalizes():
    x = np.full((1, 64, 64, 3), 0.5, np.float32)
    out = np.asarray(preprocess_images(x))
    assert out.shape == (1, 224, 224, 3)
    from sige_tpu.models.sd.safety import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    want = (0.5 - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    np.testing.assert_allclose(out[0, 100, 100], want, atol=1e-5)


# ------------------------------------------------------------- watermark
def test_bits_bytes_roundtrip():
    payload = b"StableDiffusionV1"
    assert bits_to_bytes(bytes_to_bits(payload)) == payload


@pytest.mark.parametrize("shape", [(128, 128, 3), (130, 94, 3)])
def test_watermark_roundtrip(shape):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    payload = b"StableDiffusionV1"
    enc = WatermarkEncoder(payload)
    stamped = enc.encode(img)
    assert stamped.shape == img.shape and stamped.dtype == np.uint8
    # invisible: small mean perturbation
    assert np.mean(np.abs(stamped.astype(int) - img.astype(int))) < 8.0
    dec = WatermarkEncoder(payload)  # fresh instance, knows only length
    assert dec.decode(stamped) == payload


def test_watermark_survives_small_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    payload = b"SIGE"
    enc = WatermarkEncoder(payload)
    stamped = enc.encode(img).astype(np.int16)
    noisy = np.clip(stamped + rng.integers(-2, 3, stamped.shape), 0, 255
                    ).astype(np.uint8)
    assert enc.decode(noisy) == payload


def test_put_watermark_noop_without_encoder():
    img = np.zeros((16, 16, 3), np.uint8)
    assert put_watermark(img, None) is img


def test_watermark_set_watermark_api():
    enc = WatermarkEncoder()
    enc.set_watermark("bytes", b"AB")
    assert enc.n_payload_bytes == 2
    with pytest.raises(ValueError):
        enc.set_watermark("bits", b"x")
