"""HTTP-level e2e for the demo web server + DPM-Solver demo sampler
(reference: diffusion_demo/start.py drives the runner through a UI; here
the http.server endpoints are the UI contract)."""

import base64
import io
import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

from sige_tpu.demo import DemoRunner
from sige_tpu.demo.server import make_handler
from sige_tpu.models.ddpm import DDPMUNetConfig

TINY = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=32,
                      sparse_resolution_threshold=32)
R = 32


def _data_url(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
        buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as res:
        return json.loads(res.read())


@pytest.fixture(scope="module")
def server():
    runner = DemoRunner(TINY, sample_steps=4, noise_level=40,
                        total_steps=100, mask_dilate_radius=2, bucket_min=1)
    rng = np.random.default_rng(0)
    base = rng.random((R, R, 3)).astype(np.float32)
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(runner, base, R))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", base
    httpd.shutdown()


def test_index_serves_ui(server):
    url, _ = server
    with urllib.request.urlopen(url, timeout=60) as res:
        page = res.read().decode()
    assert "sige-tpu" in page and f"const R = {R}" in page
    # the three tools the reference demo ships (brush/eraser/fill)
    for tool in ("brush", "eraser", "fill"):
        assert tool in page


def test_reset_generate_apply_flow(server):
    url, base = server
    js = _post(url + "/reset", {})
    assert js["base"].startswith("data:image/png") and js["ms"] > 0

    edited = base.copy()
    edited[8:16, 10:20] = 0.9
    js = _post(url + "/generate", {"image": _data_url(edited)})
    assert js["image"].startswith("data:image/png") and js["ms"] > 0

    js = _post(url + "/apply", {"image": _data_url(edited)})
    assert js["image"].startswith("data:image/png")

    # after apply, regenerating the same image is a no-op edit: the
    # returned PNG decodes to (approximately) the edited image itself
    js = _post(url + "/generate", {"image": _data_url(edited)})
    from PIL import Image

    raw = base64.b64decode(js["image"].split(",", 1)[1])
    out = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                     np.float32) / 255.0
    want = np.clip(edited, 0, 1)
    assert np.mean(np.abs(out - want)) < 0.02  # png quantization only


def test_multi_session_http_flow():
    """--sessions N over HTTP: two users with different bases and edits,
    addressed via the payload's session id; one user's apply must not
    leak into the other's state."""
    from sige_tpu.demo.runner import MultiSessionDemoRunner

    runner = MultiSessionDemoRunner(2, TINY, sample_steps=4, noise_level=40,
                                    total_steps=100, mask_dilate_radius=2,
                                    bucket_min=1)
    rng = np.random.default_rng(5)
    base = rng.random((R, R, 3)).astype(np.float32)
    httpd = HTTPServer(("127.0.0.1", 0),
                       make_handler(runner, base, R, sessions=2))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        for sid in (0, 1):
            js = _post(url + "/reset", {"session": sid})
            assert js["base"].startswith("data:image/png")

        e0, e1 = base.copy(), base.copy()
        e0[4:12, 6:14] = 0.9
        e1[20:28, 2:26] = 0.1
        js0 = _post(url + "/generate", {"image": _data_url(e0), "session": 0})
        js1 = _post(url + "/generate", {"image": _data_url(e1), "session": 1})
        assert js0["image"] != js1["image"]

        # session 0 applies; session 1's no-op regenerate of ITS edit
        # still reflects session 1's own baseline (no cross-talk)
        _post(url + "/apply", {"image": _data_url(e0), "session": 0})
        js = _post(url + "/generate", {"image": _data_url(e0), "session": 0})
        from PIL import Image

        raw = base64.b64decode(js["image"].split(",", 1)[1])
        out = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                         np.float32) / 255.0
        assert np.mean(np.abs(out - np.clip(e0, 0, 1))) < 0.02

        import urllib.error

        try:
            _post(url + "/reset", {"session": 9})
            assert False, "expected HTTP 400 for out-of-range session"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_demo_dpm_solver_sampler():
    runner = DemoRunner(TINY, sample_steps=4, noise_level=40,
                        total_steps=100, mask_dilate_radius=2, bucket_min=1,
                        sampler_type="dpm_solver")
    rng = np.random.default_rng(1)
    base = rng.random((R, R, 3)).astype(np.float32)
    out = runner.reset_base_image(base)
    assert out.shape == (R, R, 3) and np.isfinite(out).all()

    edited = base.copy()
    edited[10:18, 12:20] = 0.9
    out = runner.generate(edited)
    assert np.isfinite(out).all()
    # empty edit short-circuits to the base image
    out2 = runner.generate(base)
    np.testing.assert_allclose(out2, np.clip(base, 0, 1), atol=1e-5)

    # apply advances the baseline
    _ = runner.generate(edited, sparse_update=True)
    out3 = runner.generate(edited)
    np.testing.assert_allclose(out3, np.clip(edited, 0, 1), atol=1e-5)


def test_stamps_endpoint_and_tools_in_page(server):
    url, _ = server
    with urllib.request.urlopen(url, timeout=60) as res:
        page = res.read().decode()
    # round-3 tool parity: stamp + undo (reference:
    # diffusion_demo/ui/canvas.py:289-292, ui/hparams.py:41-62)
    for frag in ("stamp", "undo()", "snapshot()"):
        assert frag in page
    with urllib.request.urlopen(url + "/stamps", timeout=60) as res:
        stamps = json.loads(res.read())
    assert set(stamps) == {"sun", "moon", "tree", "house"}
    for v in stamps.values():
        assert v.startswith("data:image/png;base64,")


def test_canvas_stamp_and_undo_ops():
    from sige_tpu.demo.canvas import UndoStack, make_stamp, place_stamp

    img = np.zeros((32, 32, 3), np.float32)
    stamp = make_stamp("sun", size=16)
    assert stamp.shape == (16, 16, 4)

    undo = UndoStack(limit=3)
    undo.push(img)
    out = place_stamp(img, stamp, 16, 16)
    # centered placement painted the middle, left the corners alone
    assert out[16, 16].sum() > 0.5
    assert out[0, 0].sum() == 0 and (img == 0).all()  # input untouched

    # clipped placement at the border must not wrap or raise
    out2 = place_stamp(out, stamp, 0, 0, scale=2.0)
    assert out2.shape == img.shape and np.isfinite(out2).all()
    assert out2[31, 31].sum() == out[31, 31].sum()

    undo.push(out)
    undo.push(out2)
    undo.push(out2)  # over limit: oldest snapshot dropped
    assert len(undo) == 3
    np.testing.assert_array_equal(undo.pop(), out2)
    np.testing.assert_array_equal(undo.pop(), out2)
    np.testing.assert_array_equal(undo.pop(), out)
    assert undo.pop() is None
