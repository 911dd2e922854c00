"""Two-replica A/B web demo: dense vs FrameFusion side by side, with
STREAMED partial generations.

Counterpart of /root/reference/script/demo/llava_video_compare.py (Gradio,
two GPU replicas, threaded generation with streamed partial results
:309-331, latency bars :486-507). This image has no gradio, so the demo is a
stdlib HTTP server: the page opens an EventSource on GET /stream, the server
generates with both replicas concurrently (ThreadPoolExecutor, like the
reference) and pushes one SSE event per decode chunk per replica
(``engine.generate_stream`` — cumulative tokens so far), then a final event
with latencies + compression telemetry. On a TPU slice the two replicas
would pin to two device subsets of one mesh; on this single-chip runner they
share the chip inside the executor.

Usage: python scripts/demo_compare.py [--port 7860] then open the page,
or --selftest for the reference's startup sanity check (:522-549) — it
additionally asserts each replica streamed >=2 progressive updates.
"""

import argparse
import json
import queue
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
function run(){
  document.getElementById('status').textContent=' running...';
  const es = new EventSource('/stream');
  es.onmessage = (m)=>{
    const d = JSON.parse(m.data);
    if (d.kind === 'partial'){
      const id = d.replica === 'dense' ? 'out_a' : 'out_b';
      document.getElementById(id).textContent = 'tokens: '+d.tokens.join(' ');
    } else if (d.kind === 'final'){
      const mx = Math.max(d.dense_ms, d.ff_ms);
      document.getElementById('bar_a').style.width = (90*d.dense_ms/mx)+'%';
      document.getElementById('bar_b').style.width = (90*d.ff_ms/mx)+'%';
      document.getElementById('lat_a').textContent = d.dense_ms.toFixed(1)+' ms prefill';
      document.getElementById('lat_b').textContent = d.ff_ms.toFixed(1)+' ms prefill ('+d.speedup.toFixed(2)+'x)';
      document.getElementById('tel').textContent = JSON.stringify(d.telemetry, null, 2);
      document.getElementById('status').textContent=' done';
      es.close();
    }
  };
  es.onerror = ()=>{ es.close(); document.getElementById('status').textContent=' error'; };
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

    def run_ab_stream(self, emit, max_new_tokens=12, chunk=3):
        """Generate with both replicas concurrently, pushing one
        ``emit(event_dict)`` per decode chunk per replica (kind="partial",
        cumulative tokens) and a closing kind="final" event with latencies +
        telemetry — the reference's streamed ThreadPoolExecutor A/B
        (llava_video_compare.py:309-331) as a transport-agnostic callback."""

        def gen(name, model):
            t, res = DeviceTimer.timeit(
                lambda: model.prefill(self.inputs), lambda r: r.logits, reps=1)
            toks = []
            for toks in model.engine().generate_stream(res, max_new_tokens, chunk=chunk):
                emit({"kind": "partial", "replica": name, "tokens": toks})
            return t * 1e3, toks, res

        with self.lock:
            with ThreadPoolExecutor(max_workers=2) as ex:
                fa = ex.submit(gen, "dense", self.dense)
                fb = ex.submit(gen, "ff", self.ff)
                dense_ms, dense_toks, _ = fa.result()
                ff_ms, ff_toks, ff_res = fb.result()
        final = {
            "kind": "final",
            "dense_ms": dense_ms, "ff_ms": ff_ms, "speedup": dense_ms / ff_ms,
            "dense_tokens": dense_toks, "ff_tokens": ff_toks,
            "telemetry": ff_res.telemetry.summary(),
        }
        emit(final)
        return final


def selftest(state):
    """Reference test_sanity twin (+ the streaming contract): both replicas
    must push >=2 progressive partial updates before the final event."""
    events = []
    out = state.run_ab_stream(events.append, max_new_tokens=9, chunk=3)
    partials = {"dense": [], "ff": []}
    for e in events[:-1]:
        assert e["kind"] == "partial", e
        partials[e["replica"]].append(e["tokens"])
    assert events[-1]["kind"] == "final"
    for name, seen in partials.items():
        assert len(seen) >= 2, f"{name} streamed {len(seen)} updates (<2)"
        for a, b in zip(seen, seen[1:]):
            assert b[: len(a)] == a, f"{name} partials not cumulative"
        assert seen[-1] == out[f"{name}_tokens"]
    print(json.dumps({k: v for k, v in out.items() if k != "telemetry"}))
    print("sanity ok: speedup", round(out["speedup"], 2),
          "| stream updates:", {k: len(v) for k, v in partials.items()})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    state = DemoState(args.num_frames)
    if args.selftest:
        selftest(state)
        return

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/stream":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(PAGE.encode())
                return
            # SSE: one event per decode chunk per replica, then the final.
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            q: "queue.Queue" = queue.Queue()
            worker = threading.Thread(
                target=lambda: (state.run_ab_stream(q.put), q.put(None)), daemon=True)
            worker.start()
            while True:
                ev = q.get()
                if ev is None:
                    break
                try:
                    self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode())
                    self.wfile.flush()
                except BrokenPipeError:
                    break  # client went away; the worker drains harmlessly

        def log_message(self, *a):
            pass

    print(f"serving on http://localhost:{args.port}")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
