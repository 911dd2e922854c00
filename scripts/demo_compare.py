"""Two-replica A/B web demo: dense vs FrameFusion side by side.

Counterpart of /root/reference/script/demo/llava_video_compare.py (Gradio,
two GPU replicas, threaded generation, latency bars). This image has no
gradio, so the demo is a stdlib HTTP server: one page, POST /run generates
with both replicas (ThreadPoolExecutor, like the reference :309-331) and
returns outputs + latency bars + compression telemetry. On a TPU slice the
two replicas would pin to two device subsets of one mesh; on this single-chip
runner they share the chip and run sequentially inside the executor.

Usage: python scripts/demo_compare.py [--port 7860] then open the page,
or --selftest for the reference's startup sanity check (:522-549).
"""

import argparse
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from common import DeviceTimer, synthetic_video

PAGE = """<!doctype html><html><head><title>FrameFusion-TPU A/B</title><style>
body{font-family:sans-serif;max-width:900px;margin:2em auto}
.col{display:inline-block;width:45%;vertical-align:top;padding:1em;border:1px solid #ccc;border-radius:8px;margin:0.5em}
.bar{height:18px;background:#4a90d9;border-radius:3px}
pre{white-space:pre-wrap}</style></head><body>
<h2>FrameFusion-TPU: dense vs compressed</h2>
<button onclick="run()">Run A/B generation</button> <span id="status"></span>
<div><div class="col"><h3>Dense</h3><div id="bar_a" class="bar" style="width:0"></div>
<p id="lat_a"></p><pre id="out_a"></pre></div>
<div class="col"><h3>FrameFusion</h3><div id="bar_b" class="bar" style="width:0"></div>
<p id="lat_b"></p><pre id="out_b"></pre></div></div>
<h3>Compression telemetry</h3><pre id="tel"></pre>
<script>
async function run(){
  document.getElementById('status').textContent=' running...';
  const r = await fetch('/run',{method:'POST'}); const d = await r.json();
  const mx = Math.max(d.dense_ms, d.ff_ms);
  document.getElementById('bar_a').style.width = (90*d.dense_ms/mx)+'%';
  document.getElementById('bar_b').style.width = (90*d.ff_ms/mx)+'%';
  document.getElementById('lat_a').textContent = d.dense_ms.toFixed(1)+' ms prefill';
  document.getElementById('lat_b').textContent = d.ff_ms.toFixed(1)+' ms prefill ('+d.speedup.toFixed(2)+'x)';
  document.getElementById('out_a').textContent = 'tokens: '+d.dense_tokens;
  document.getElementById('out_b').textContent = 'tokens: '+d.ff_tokens;
  document.getElementById('tel').textContent = JSON.stringify(d.telemetry, null, 2);
  document.getElementById('status').textContent=' done';
}
</script></body></html>"""


class DemoState:
    def __init__(self, num_frames=16):
        import jax
        import jax.numpy as jnp

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.models.adapters import llava_video
        from framefusion_tpu.models.vision import siglip
        from framefusion_tpu.models.vision.llava_frontend import encode_video, init_projector

        cfg = tiny_llm_config(num_layers=8, hidden_size=256, intermediate_size=512, num_heads=8)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        vit_cfg = siglip.tiny_vit_config(image_size=56, patch_size=7)
        vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
        proj = init_projector(jax.random.PRNGKey(2), vit_cfg.hidden_size, cfg.hidden_size)

        rng = np.random.default_rng(0)
        frames = synthetic_video(rng, num_frames, vit_cfg.image_size)
        toks = np.asarray(encode_video(vit, vit_cfg, proj, jnp.asarray(frames)), np.float32) * 0.05
        text = (rng.standard_normal((24, cfg.hidden_size)) * 0.05).astype(np.float32)
        self.inputs = llava_video.build_prefill_inputs(text, toks, 20, vit_cfg.patches_per_side)

        # Replica A: dense; replica B: FrameFusion-compressed (reference
        # :218-233 puts them on cuda:0/cuda:1; here two engine instances).
        self.dense = FrameFusionModel(family="llava_video", cfg=cfg, params=params)
        ff = apply_framefusion(self.dense, 0.3, 0.6, 0.1)
        ff.ff = ff.ff.replace(schedule_num_layers=cfg.num_layers)
        self.ff = ff
        self.lock = threading.Lock()

    def run_ab(self, max_new_tokens=12):
        def gen(model):
            t, res = DeviceTimer.timeit(lambda: model.prefill(self.inputs), lambda r: r.logits, reps=1)
            toks = model.engine().generate_greedy(res, max_new_tokens)
            return t * 1e3, toks, res

        with self.lock:
            with ThreadPoolExecutor(max_workers=2) as ex:
                fa = ex.submit(gen, self.dense)
                fb = ex.submit(gen, self.ff)
                dense_ms, dense_toks, _ = fa.result()
                ff_ms, ff_toks, ff_res = fb.result()
        return {
            "dense_ms": dense_ms, "ff_ms": ff_ms, "speedup": dense_ms / ff_ms,
            "dense_tokens": dense_toks, "ff_tokens": ff_toks,
            "telemetry": ff_res.telemetry.summary(),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    state = DemoState(args.num_frames)
    if args.selftest:
        out = state.run_ab(max_new_tokens=6)
        print(json.dumps({k: v for k, v in out.items() if k != "telemetry"}))
        print("sanity ok: speedup", round(out["speedup"], 2))
        return

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            out = state.run_ab()
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"serving on http://localhost:{args.port}")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
