"""Interactive plume-labeling web app.

Reference (cmftagger/cmftagger.py): a multi-user Panel/HoloViews/Bokeh
server with per-user ports, flightline assignment, layered CMF/RGB views,
double-tap candidate adding, editable label tables, autosave and a
submit/reset lifecycle. Panel/Bokeh are not available in this
environment, so this app serves the same workflow over the stdlib HTTP
server + a small vanilla-JS page:

- flightline list with todo/done state (reference: cmftagger.py:292-346)
- RGB + CMF-overlay rendering of each flightline (PNG; pixel coords are
  image coords, so a click maps directly to sample/line -> lat/lon)
- click-to-add candidates with label selection (reference: :711-755)
- per-candidate label editing/deleting (reference: :396-430, :471-532)
- autosave on every edit + submit/reset into output/<user>/submitted/
  (reference: :534-664)
- the in-app ring-buffer log (reference: :250-290)

State is :class:`srcfinder_tpu.qc.session.QcSession`; labels merge
downstream through :mod:`srcfinder_tpu.qc.collect`.
"""

from __future__ import annotations

import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .labels import (LIDCOL, CIDCOL, LATCOL, LONCOL, LABCOL, POSLABS,
                     NEGLABS, AMBLABS)
from .session import QcSession

__all__ = ["QcWebApp", "user_port", "render_cmf_png"]

ALL_LABELS = POSLABS + NEGLABS + AMBLABS


def user_port(users, user, base_port: int = 5006) -> int:
    """Per-user port assignment (reference: cmftagger.py:32-42)."""
    return base_port + sorted(users).index(user)


def render_cmf_png(cmff, minppmm: float = 250, maxppmm: float = 1500,
                   rdnmax: float = 15.0) -> bytes:
    """RGB radiance + red CMF overlay as PNG bytes, 1 image px per CMF px
    (so browser click coords ARE (sample, line))."""
    from PIL import Image
    from ..core.loaders import loadcmf
    cmf, rgba, nodata, _ = loadcmf(cmff, rdnmax=rdnmax)
    rgb = (rgba[..., :3] * 255).astype(np.uint8)
    hot = np.clip((cmf - minppmm) / (maxppmm - minppmm), 0, 1)
    mask = (cmf > minppmm) & ~nodata
    rgb[mask, 0] = np.uint8(255)
    rgb[mask, 1] = (rgb[mask, 1] * (1 - hot[mask])).astype(np.uint8)
    rgb[mask, 2] = (rgb[mask, 2] * (1 - hot[mask])).astype(np.uint8)
    rgb[nodata] = 0
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


_PAGE = """<!doctype html><html><head><title>srcfinder QC tagger</title>
<style>body{font-family:sans-serif;margin:1em}table{border-collapse:collapse}
td,th{border:1px solid #999;padding:2px 6px}#log{white-space:pre;background:#eee;
padding:4px;font-size:11px;max-height:8em;overflow-y:auto}</style></head><body>
<h3>srcfinder QC tagger — user: <span id=user></span></h3>
<div>flightline: <select id=fl></select>
 label: <select id=lab></select>
 <button onclick="submitFl()">submit</button>
 <button onclick="resetFl()">reset</button></div>
<p>click the image to add a candidate with the selected label</p>
<img id=img style="border:1px solid #333;image-rendering:pixelated"
     onclick="addCand(event)">
<h4>candidates</h4><table id=tbl></table>
<h4>log</h4><div id=log></div>
<script>
async function j(u,opts){const r=await fetch(u,opts);return r.json();}
async function init(){
 const info=await j('/api/info');
 document.getElementById('user').textContent=info.user;
 const sel=document.getElementById('fl');
 for(const f of info.todo.concat(info.done)){
   const o=document.createElement('option');o.value=f;
   o.textContent=(info.done.includes(f)?'[done] ':'')+f;sel.appendChild(o);}
 const lsel=document.getElementById('lab');
 for(const l of info.labels){const o=document.createElement('option');
   o.value=l;o.textContent=l;lsel.appendChild(o);}
 sel.onchange=load; if(sel.options.length) load();
 refreshLog();
}
function fl(){return document.getElementById('fl').value;}
async function load(){
 document.getElementById('img').src='/img?fl='+encodeURIComponent(fl())
   +'&t='+Date.now();
 const rows=await j('/api/candidates?fl='+encodeURIComponent(fl()));
 const t=document.getElementById('tbl');
 t.innerHTML='<tr><th>cid</th><th>label</th><th>lat</th><th>lon</th><th></th></tr>';
 for(const r of rows){const tr=document.createElement('tr');
  tr.innerHTML='<td>'+r.cid+'</td><td>'+r.label+'</td><td>'+r.lat.toFixed(5)
   +'</td><td>'+r.lon.toFixed(5)+'</td>'
   +'<td><button onclick="delCand(\\''+r.cid+'\\')">delete</button></td>';
  t.appendChild(tr);}
}
async function addCand(e){
 const img=document.getElementById('img');
 const x=Math.floor(e.offsetX*img.naturalWidth/img.width);
 const y=Math.floor(e.offsetY*img.naturalHeight/img.height);
 await j('/api/add',{method:'POST',body:JSON.stringify(
   {fl:fl(),col:x,row:y,label:document.getElementById('lab').value})});
 load();refreshLog();
}
async function delCand(cid){
 await j('/api/delete',{method:'POST',body:JSON.stringify({fl:fl(),cid:cid})});
 load();refreshLog();
}
async function submitFl(){await j('/api/submit',{method:'POST',
 body:JSON.stringify({fl:fl()})});refreshLog();}
async function resetFl(){await j('/api/reset',{method:'POST',
 body:JSON.stringify({fl:fl()})});load();refreshLog();}
async function refreshLog(){
 const l=await j('/api/log');
 document.getElementById('log').textContent=l.text;}
init();
</script></body></html>"""


class QcWebApp:
    """HTTP labeling app over a :class:`QcSession`."""

    def __init__(self, session: QcSession, plumedf=None, host="127.0.0.1",
                 port: int = 0):
        self.session = session
        self.plumedf = plumedf
        self._tables = {}          # cmff -> working DataFrame
        app = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, obj, code=200):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                if parsed.path == "/":
                    self._send(200, _PAGE.encode(), "text/html")
                elif parsed.path == "/api/info":
                    import os
                    self._json(dict(
                        user=app.session.user,
                        todo=[os.path.basename(f) for f in app.session.todo],
                        done=[os.path.basename(f) for f in app.session.done],
                        labels=ALL_LABELS))
                elif parsed.path == "/img":
                    cmff = app._resolve(q.get("fl", ""))
                    self._send(200, render_cmf_png(cmff), "image/png")
                elif parsed.path == "/api/candidates":
                    self._json(app.candidates(q.get("fl", "")))
                elif parsed.path == "/api/log":
                    self._json(dict(text=app.session.log.text()))
                else:
                    self._json(dict(error="not found"), 404)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                parsed = urllib.parse.urlparse(self.path)
                try:
                    if parsed.path == "/api/add":
                        app.add(body["fl"], int(body["row"]),
                                int(body["col"]), body["label"])
                    elif parsed.path == "/api/delete":
                        app.delete(body["fl"], body["cid"])
                    elif parsed.path == "/api/submit":
                        app.session.submit(app._resolve(body["fl"]))
                    elif parsed.path == "/api/reset":
                        cmff = app._resolve(body["fl"])
                        app.session.reset(cmff)
                        app._tables.pop(cmff, None)
                    else:
                        return self._json(dict(error="not found"), 404)
                    self._json(dict(ok=True))
                except Exception as e:  # surface errors to the UI
                    self._json(dict(error=str(e)), 400)

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread = None

    # ---- app logic -----------------------------------------------------
    def _resolve(self, fl_basename: str) -> str:
        import os
        for f in self.session.datafiles:
            if os.path.basename(f) == fl_basename:
                return f
        raise KeyError(f"unknown flightline {fl_basename}")

    def _table(self, cmff):
        if cmff not in self._tables:
            self._tables[cmff] = self.session.load_candidates(
                cmff, self.plumedf)
        return self._tables[cmff]

    def _mapinfo(self, cmff):
        from ..core.geo import mapinfo
        from ..core.envi import open_envi
        return mapinfo(open_envi(cmff))

    def candidates(self, fl_basename: str):
        from ..core.geo import latlon2sl
        cmff = self._resolve(fl_basename)
        df = self._table(cmff)
        out = []
        m = self._mapinfo(cmff)
        for _, r in df.iterrows():
            lat, lon = float(r[LATCOL]), float(r[LONCOL])
            s, l = latlon2sl(lat, lon, mapinfo=m)
            out.append(dict(cid=str(r[CIDCOL]), label=str(r[LABCOL]),
                            lat=lat, lon=lon, col=float(s), row=float(l)))
        return out

    def add(self, fl_basename: str, row: int, col: int, label: str):
        from ..core.geo import sl2latlon
        cmff = self._resolve(fl_basename)
        m = self._mapinfo(cmff)
        lat, lon = sl2latlon(col, row, mapinfo=m)
        df = self.session.add_candidate(self._table(cmff), cmff,
                                        float(lat), float(lon), label)
        self._tables[cmff] = df
        self.session.autosave(cmff, df)
        return df

    def delete(self, fl_basename: str, cid: str):
        cmff = self._resolve(fl_basename)
        df = self.session.delete_candidate(self._table(cmff), cid)
        self._tables[cmff] = df
        self.session.autosave(cmff, df)
        return df

    # ---- lifecycle -----------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self.port

    def stop(self):
        self.server.shutdown()

    def serve_forever(self):
        print(f"srcfinder QC tagger: http://127.0.0.1:{self.port}/ "
              f"(user {self.session.user})")
        self.server.serve_forever()


def main(argv=None):
    """CLI (reference: cmftagger.py argparse surface: --port, user/paths
    from config/settings.json)."""
    import argparse
    from .session import load_settings

    p = argparse.ArgumentParser(description="srcfinder QC tagger (TPU)")
    p.add_argument("--config", default="config/settings.json")
    p.add_argument("--user", required=True)
    p.add_argument("--datapath", default=None)
    p.add_argument("--output", default="output")
    p.add_argument("--port", type=int, default=0)
    args = p.parse_args(argv)

    settings = {}
    try:
        settings = load_settings(args.config)
    except FileNotFoundError:
        pass
    datapath = args.datapath or settings.get("datapath", ".")
    users = settings.get("users", [args.user])
    port = args.port or user_port(users, args.user)
    sess = QcSession(args.user, datapath, args.output)
    QcWebApp(sess, port=port).serve_forever()
    return 0


if __name__ == "__main__":
    main()
