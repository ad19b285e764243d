"""Zero-dependency web UI for interactive editing.

The reference ships a PyQt5 paint app (reference: diffusion_demo/start.py,
ui/); on a headless TPU VM a browser canvas is the natural equivalent.

  python -m sige_tpu.demo.server --resolution 64 --tiny   # smoke config
  python -m sige_tpu.demo.server --image path.png         # church256 demo

Endpoints: POST /reset {image: dataURL} -> base conversion;
POST /generate {image} -> sparse edit preview;
POST /apply {image} -> commit edit (sparse_update).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>sige-tpu demo</title><style>
body{font-family:sans-serif;margin:20px} canvas{border:1px solid #888;
image-rendering:pixelated;width:512px;height:512px} .row{display:flex;gap:16px}
button{margin:4px;padding:6px 14px}</style></head><body>
<h2>sige-tpu interactive editing <span id="sess"></span></h2>
<div class="row">
 <div><h4>paint</h4><canvas id="edit"></canvas></div>
 <div><h4>generated</h4><canvas id="out"></canvas></div>
</div>
<div>
 tool <select id="tool">
  <option value="brush">brush</option>
  <option value="eraser">eraser</option>
  <option value="fill">fill</option>
  <option value="stamp">stamp</option>
 </select>
 stamp <select id="stamp"></select>
 <input type="file" id="stampfile" accept="image/*" style="width:140px">
 color <input type="color" id="color" value="#b05030">
 size <input type="range" id="size" min="2" max="40" value="12">
 <button onclick="undo()">undo</button>
 <button onclick="send('/generate')">generate</button>
 <button onclick="send('/apply')">apply</button>
 <button onclick="reset()">reset base</button>
 <span id="status"></span>
</div>
<script>
const R = %RES%;
// multi-user: /?session=N addresses one of the server's dp-sharded
// sessions (each has its own base image, caches and edit plan)
const SESSION = parseInt(new URLSearchParams(location.search)
                         .get('session') || '0', 10);
if (SESSION) document.getElementById('sess').textContent =
    '(session ' + SESSION + ')';
const ec = document.getElementById('edit'), oc = document.getElementById('out');
ec.width = ec.height = oc.width = oc.height = R;
const ectx = ec.getContext('2d'), octx = oc.getContext('2d');
let drawing = false;
let baseImg = null;  // kept for the eraser (restores base pixels)
const undoStack = [];  // bounded snapshot history (server twin: demo/canvas.py UndoStack)
function snapshot(){
  undoStack.push(ectx.getImageData(0, 0, R, R));
  if (undoStack.length > 20) undoStack.shift();
}
function undo(){
  const im = undoStack.pop();
  if (im) ectx.putImageData(im, 0, 0);
}
window.onkeydown = e => {
  if ((e.ctrlKey || e.metaKey) && e.key === 'z') { e.preventDefault(); undo(); }
};
const stamps = {};  // name -> Image, filled from /stamps + the file input
document.getElementById('stampfile').onchange = e => {
  const f = e.target.files[0];
  if (!f) return;
  const img = new Image();
  img.onload = () => {
    stamps[f.name] = img;
    const o = document.createElement('option');
    o.value = o.textContent = f.name;
    document.getElementById('stamp').appendChild(o);
    document.getElementById('stamp').value = f.name;
  };
  img.src = URL.createObjectURL(f);
};
function stampAt(e){
  // centered placement, like the reference's drawPixmap stamp
  const img = stamps[document.getElementById('stamp').value];
  if (!img) return;
  const [x, y] = pos(e);
  const s = document.getElementById('size').value * R / 512 * 6;
  snapshot();
  ectx.drawImage(img, x - s/2, y - s/2, s, s);
}
ec.onmousedown = e => {
  const t = document.getElementById('tool').value;
  if (t === 'fill') { snapshot(); fill(e); return; }
  if (t === 'stamp') { stampAt(e); return; }
  snapshot();
  drawing = true; draw(e);
};
ec.onmousemove = e => {if (drawing) draw(e);};
window.onmouseup = () => drawing = false;
function pos(e){
  const r = ec.getBoundingClientRect();
  return [(e.clientX - r.left) * R / r.width,
          (e.clientY - r.top) * R / r.height];
}
function draw(e){
  const [x, y] = pos(e);
  const s = document.getElementById('size').value * R / 512;
  if (document.getElementById('tool').value === 'eraser' && baseImg){
    // restore the base image under a square around the cursor
    const x0 = Math.max(0, x - s), y0 = Math.max(0, y - s);
    ectx.drawImage(baseImg, x0, y0, 2*s, 2*s, x0, y0, 2*s, 2*s);
    return;
  }
  ectx.fillStyle = document.getElementById('color').value;
  ectx.beginPath(); ectx.arc(x, y, s, 0, 7); ectx.fill();
}
function fill(e){
  // flood fill from the click point over similar-colored pixels
  const [fx, fy] = pos(e).map(Math.floor);
  const img = ectx.getImageData(0, 0, R, R), d = img.data;
  const c = document.getElementById('color').value;
  const nr = parseInt(c.slice(1,3),16), ng = parseInt(c.slice(3,5),16),
        nb = parseInt(c.slice(5,7),16);
  const i0 = 4*(fy*R + fx);
  const sr = d[i0], sg = d[i0+1], sb = d[i0+2], TOL = 32;
  if (Math.abs(sr-nr)+Math.abs(sg-ng)+Math.abs(sb-nb) < 3) return;
  const stack = [[fx, fy]], seen = new Uint8Array(R*R);
  while (stack.length){
    const [x, y] = stack.pop();
    if (x < 0 || y < 0 || x >= R || y >= R || seen[y*R+x]) continue;
    const i = 4*(y*R + x);
    if (Math.abs(d[i]-sr)+Math.abs(d[i+1]-sg)+Math.abs(d[i+2]-sb) > TOL)
      continue;
    seen[y*R+x] = 1;
    d[i] = nr; d[i+1] = ng; d[i+2] = nb; d[i+3] = 255;
    stack.push([x+1,y],[x-1,y],[x,y+1],[x,y-1]);
  }
  ectx.putImageData(img, 0, 0);
}
async function post(path, body){
  document.getElementById('status').textContent = '...';
  const res = await fetch(path, {method:'POST', body: JSON.stringify(body)});
  const js = await res.json();
  document.getElementById('status').textContent = js.ms ? js.ms.toFixed(0)+' ms' : '';
  return js;
}
async function send(path){
  const js = await post(path, {image: ec.toDataURL(), session: SESSION});
  const img = new Image();
  img.onload = () => octx.drawImage(img, 0, 0);
  img.src = js.image;
  if (path === '/apply') { /* edited becomes the new baseline */ }
}
async function reset(){
  const js = await post('/reset', {session: SESSION});
  const img = new Image();
  img.onload = () => {
    ectx.drawImage(img, 0, 0); octx.drawImage(img, 0, 0); baseImg = img;
  };
  img.src = js.base;
  undoStack.length = 0;
}
async function loadStamps(){
  const res = await fetch('/stamps');
  const js = await res.json();
  const sel = document.getElementById('stamp');
  for (const [name, url] of Object.entries(js)){
    const img = new Image();
    img.src = url;
    stamps[name] = img;
    const o = document.createElement('option');
    o.value = o.textContent = name;
    sel.appendChild(o);
  }
}
loadStamps();
reset();
</script></body></html>"""


def _png_to_array(data_url: str, R: int) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(data_url.split(",", 1)[1])
    img = Image.open(io.BytesIO(raw)).convert("RGB").resize((R, R))
    return np.asarray(img, np.float32) / 255.0


def _array_to_data_url(arr: np.ndarray, alpha: np.ndarray = None) -> str:
    from PIL import Image

    rgb = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if alpha is not None:
        rgb = np.concatenate(
            [rgb, (np.clip(alpha, 0, 1) * 255).astype(np.uint8)[..., None]],
            axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def make_handler(runner, base_image: np.ndarray, resolution: int,
                 sessions: int = 1):
    import time

    multi = sessions > 1

    class Handler(BaseHTTPRequestHandler):
        def _send(self, obj, code=200, ctype="application/json"):
            body = obj if isinstance(obj, bytes) else json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stamps":
                from .canvas import STAMP_NAMES, make_stamp

                rgba = {
                    name: _array_to_data_url(make_stamp(name)[..., :3],
                                             alpha=make_stamp(name)[..., 3])
                    for name in STAMP_NAMES
                }
                self._send(rgba)
                return
            self._send(PAGE.replace("%RES%", str(resolution)).encode(),
                       ctype="text/html")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            t0 = time.perf_counter()
            try:
                sid = int(payload.get("session") or 0)
            except (TypeError, ValueError):
                sid = -1
            if not 0 <= sid < sessions:
                self._send({"error": f"session {payload.get('session')!r} "
                                     f"out of range (0..{sessions - 1})"},
                           code=400)
                return
            if self.path == "/reset":
                out = (runner.reset_base_image(sid, base_image) if multi
                       else runner.reset_base_image(base_image))
                self._send({"base": _array_to_data_url(out),
                            "ms": (time.perf_counter() - t0) * 1e3})
                return
            edited = _png_to_array(payload["image"], resolution)
            upd = self.path == "/apply"
            out = (runner.generate(sid, edited, sparse_update=upd) if multi
                   else runner.generate(edited, sparse_update=upd))
            self._send({"image": _array_to_data_url(out),
                        "ms": (time.perf_counter() - t0) * 1e3})

        def log_message(self, *a):
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--sample_steps", type=int, default=25)
    p.add_argument("--sampler", choices=("ddim", "dpm_solver"),
                   default="ddim",
                   help="dpm_solver is the reference demo's default")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight model for smoke testing")
    p.add_argument("--restore_from", type=str, default=None)
    p.add_argument("--sessions", type=int, default=1,
                   help="concurrent editing sessions (dp-sharded; open "
                        "/?session=N per user)")
    args = p.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    from ..models.ddpm import DDPMUNetConfig
    from .runner import DemoRunner

    R = args.resolution
    if args.tiny:
        cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(8,), resolution=R,
                             sparse_resolution_threshold=R)
    else:
        cfg = DDPMUNetConfig(resolution=R)
    restore = args.restore_from
    if restore is None and not args.tiny and R == 256:
        # serve converted church256 weights when the registered checkpoint
        # already sits in ./pretrained (reference demo loads them by
        # default; diffusion_demo/runner.py)
        import os

        from ..utils.registry import REGISTRY

        cand = os.path.join("pretrained", "church256-ddpm-fused_unet.pth")
        if "church256-ddpm-fused_unet.pth" in REGISTRY and os.path.exists(cand):
            restore = cand
            print(f"restoring local checkpoint {cand}")
    params = None
    if restore:
        from ..utils.convert import convert_ddpm_fused_unet, load_torch_state_dict

        params = convert_ddpm_fused_unet(
            load_torch_state_dict(restore), cfg.ch_mult,
            cfg.num_res_blocks, cfg.attn_resolutions, cfg.resolution)
    kw = dict(sample_steps=args.sample_steps, params=params,
              bucket_min=1 if args.tiny else 8, sampler_type=args.sampler)
    if args.sessions > 1:
        from .runner import MultiSessionDemoRunner

        runner = MultiSessionDemoRunner(args.sessions, cfg, **kw)
    else:
        runner = DemoRunner(cfg, **kw)

    if args.image:
        from ..data import load_image

        base = load_image(args.image, size=(R, R))
    else:
        rng = np.random.default_rng(0)
        base = rng.random((R, R, 3)).astype(np.float32)

    server = HTTPServer(("0.0.0.0", args.port),
                        make_handler(runner, base, R,
                                     sessions=args.sessions))
    print(f"sige-tpu demo on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
