"""Web chat UI (image + video) — the reference's Gradio servers
(`pipeline/serve/gradio_web_server.py`, `gradio_web_server_video.py`)
rebuilt as a dependency-free aiohttp app (Gradio is not available in this
image): a single-page chat UI that uploads images, resolves a worker via the
controller (`http_bot`, gradio_web_server.py:302-430), and consumes the
`\\0`-delimited JSON stream chunk by chunk.

Also provides the standalone deploy endpoint (POST /app/otter) mirroring
`pipeline/serve/deploy/otterhd_endpoint.py:62-98`.
"""

from __future__ import annotations

import json

INDEX_HTML = """<!doctype html>
<html><head><title>Otter-TPU Chat</title><style>
body{font-family:sans-serif;max-width:760px;margin:2em auto}
#log{border:1px solid #ccc;min-height:200px;padding:1em;white-space:pre-wrap}
.you{color:#06c}.bot{color:#333}
</style></head><body>
<h2>Otter-TPU Chat</h2>
<div id=log></div>
<p><input type=file id=img accept="image/*" multiple>
<label><input type=checkbox id=vid> video (files are frames)</label>
<input id=q size=60 placeholder="Ask about the image...">
<button onclick=send()>Send</button>
<label>max_new_tokens <input id=mnt value=512 size=5></label></p>
<script>
let history = [];
async function send(){
  const q = document.getElementById('q').value;
  const files = document.getElementById('img').files;
  let images = [];
  for (const f of files){
    const b = await f.arrayBuffer();
    let s = btoa(String.fromCharCode(...new Uint8Array(b)));
    images.push(s.replace(/\\+/g,'-').replace(/\\//g,'_'));
  }
  // video mode: frames along F via the worker's list-of-lists protocol
  if (document.getElementById('vid').checked && images.length)
    images = [images];
  log('You', q);
  const prompt = '<image>User: ' + q + ' GPT:<answer>';
  const resp = await fetch('/http_bot', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({model:'otter', prompt:prompt, images:images,
      generation_kwargs:{max_new_tokens:
        parseInt(document.getElementById('mnt').value)}})});
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = '', el = log('GPT', '');
  while (true){
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream:true});
    const parts = buf.split('\\0');
    buf = parts.pop();
    for (const p of parts){ if (p) {
      el.textContent = JSON.parse(p).text; } }
  }
}
function log(who, text){
  const d = document.getElementById('log');
  const s = document.createElement('div');
  s.innerHTML = '<b class='+(who=='You'?'you':'bot')+'>'+who+':</b> ';
  const t = document.createElement('span'); t.textContent = text;
  s.appendChild(t); d.appendChild(s); return t;
}
</script></body></html>"""


def build_app(controller_addr: str = None, worker_addr: str = None):
    """If worker_addr is given, talk to it directly (deploy/deploy.py
    standalone mode); else resolve via the controller per request."""
    import requests
    from aiohttp import web

    def resolve_worker(model: str) -> str:
        if worker_addr:
            return worker_addr
        r = requests.post(controller_addr + "/get_worker_address",
                          json={"model": model}, timeout=10)
        return r.json()["address"]

    async def index(request):
        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def http_bot(request):
        import asyncio
        params = await request.json()
        resp = web.StreamResponse()
        await resp.prepare(request)
        try:
            addr = resolve_worker(params.get("model", "otter"))
        except Exception:
            addr = ""
        if not addr:
            await resp.write(json.dumps(
                {"text": "no worker available", "error_code": 2}
            ).encode() + b"\0")
            return resp
        loop = asyncio.get_event_loop()
        # stream chunk-by-chunk in a thread to keep the event loop free
        r = await loop.run_in_executor(None, lambda: requests.post(
            addr + "/worker_generate_stream", json=params, stream=True,
            timeout=600))
        it = r.iter_lines(decode_unicode=False, delimiter=b"\0")

        def next_chunk():
            for c in it:
                if c:
                    return c
            return None

        while True:
            chunk = await loop.run_in_executor(None, next_chunk)
            if chunk is None:
                break
            await resp.write(chunk + b"\0")
        return resp

    async def app_otter(request):
        """Deploy endpoint parity (otterhd_endpoint.py:62-98): one-shot JSON
        {prompt, images} -> {result: final_text}."""
        params = await request.json()
        addr = resolve_worker(params.get("model", "otter"))
        final = {"text": "", "error_code": 2}
        if addr:
            r = requests.post(addr + "/worker_generate_stream", json=params,
                              timeout=600, stream=True)
            for chunk in r.iter_lines(decode_unicode=False, delimiter=b"\0"):
                if chunk:
                    final = json.loads(chunk)
        return web.json_response({"result": final["text"],
                                  "error_code": final.get("error_code", 0)})

    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.router.add_get("/", index)
    app.router.add_post("/http_bot", http_bot)
    app.router.add_post("/app/otter", app_otter)
    return app


def main():
    import argparse
    from aiohttp import web
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--controller-address", default="http://localhost:21001")
    p.add_argument("--worker-address", default=None,
                   help="bypass the controller (standalone deploy mode)")
    args = p.parse_args()
    web.run_app(build_app(args.controller_address, args.worker_address),
                host=args.host, port=args.port)


if __name__ == "__main__":
    main()
