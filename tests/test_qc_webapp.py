"""QC web app tests: drive the HTTP surface end to end with urllib."""

import json
import os
import urllib.request

import numpy as np
import pytest

from srcfinder_tpu import qc
from srcfinder_tpu.qc.webapp import QcWebApp, user_port, render_cmf_png
from srcfinder_tpu.core import envi as envi_io


@pytest.fixture
def app(tmp_path, rng):
    data = tmp_path / "data"
    os.makedirs(data)
    name = "ang20200924t211102_cmf_v2y1_img"
    dat = np.zeros((30, 20, 4), np.float32)
    dat[..., :3] = rng.uniform(1, 10, size=(30, 20, 3))
    dat[..., 3] = rng.normal(100, 30, size=(30, 20))
    dat[10:14, 5:8, 3] = 900.0       # visible plume overlay
    dat[0, 0] = -9999
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "391000", "3786000", "3.0",
                         "3.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    envi_io.save_envi(str(data / (name + ".hdr")), dat, metadata=meta,
                      interleave="bip")
    sess = qc.QcSession("alice", str(data), str(tmp_path / "out"))
    app = QcWebApp(sess)
    app.start()
    yield app, name
    app.stop()


def _get(app, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{app.port}{path}") as r:
        return r.read()


def _post(app, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{app.port}{path}",
        data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_webapp_end_to_end(app):
    app, name = app
    # landing page + info
    page = _get(app, "/").decode()
    assert "QC tagger" in page
    info = json.loads(_get(app, "/api/info"))
    assert info["user"] == "alice"
    assert name in info["todo"]
    assert "Plume" in info["labels"]

    # image renders as PNG, integer-magnified (click math divides out)
    png = _get(app, f"/img?fl={name}")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    im = Image.open(io.BytesIO(png))
    assert im.size[0] % 20 == 0 and im.size[1] % 30 == 0
    assert im.size[0] // 20 == im.size[1] // 30   # uniform integer scale

    # click-to-add at pixel (row 12, col 6) -> candidate A
    _post(app, "/api/add", dict(fl=name, row=12, col=6, label="Plume"))
    cands = json.loads(_get(app, f"/api/candidates?fl={name}"))
    assert len(cands) == 1
    assert cands[0]["cid"] == "A"
    assert abs(cands[0]["row"] - 12) < 1.0
    assert abs(cands[0]["col"] - 6) < 1.0

    # add a second, then delete the first
    _post(app, "/api/add", dict(fl=name, row=2, col=2,
                                label="False Enhancement"))
    _post(app, "/api/delete", dict(fl=name, cid="A"))
    cands = json.loads(_get(app, f"/api/candidates?fl={name}"))
    assert [c["cid"] for c in cands] == ["B"]

    # autosaved on disk
    assert os.path.isfile(os.path.join(app.session.userdir,
                                       name + "_cid.csv"))

    # submit moves it to done
    _post(app, "/api/submit", dict(fl=name))
    info = json.loads(_get(app, "/api/info"))
    assert name in info["done"]
    log = json.loads(_get(app, "/api/log"))
    assert "submitted" in log["text"]


def test_webapp_error_paths(app):
    app, name = app
    # unknown flightline -> 400 with error payload
    req = urllib.request.Request(
        f"http://127.0.0.1:{app.port}/api/add",
        data=json.dumps(dict(fl="nope", row=0, col=0,
                             label="Plume")).encode(), method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "unknown flightline" in e.read().decode()
    # unknown route -> 404
    try:
        _get(app, "/api/bogus")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_user_port():
    assert user_port(["bob", "alice"], "alice") == 5006
    assert user_port(["bob", "alice"], "bob") == 5007


def _png_size(data):
    import struct
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def test_webapp_viewport_and_layers(app, tmp_path):
    """Zoom/pan viewport + layer selection (reference zoom-to-candidate
    with layered DynamicMaps, cmftagger.py:793-827,950-992)."""
    app, name = app
    # full image, magnified by an integer factor
    full = _get(app, f"/img?fl={name}&layers=rgb,cmf")
    fw, fh = _png_size(full)
    assert fw % 20 == 0 and fh % 30 == 0 and fw // 20 == fh // 30
    # viewport crop: 8x6 region, integer-magnified
    crop = _get(app, f"/img?fl={name}&layers=rgb,cmf&x0=4&y0=10&x1=12&y1=16")
    cw, ch = _png_size(crop)
    assert cw % 8 == 0 and ch % 6 == 0 and cw // 8 == ch // 6
    assert cw // 8 > fw // 20 // 2  # zoomed view at least comparable scale
    # every layer combination renders
    for layers in ("rgb", "cmf", "rgb,cmf,salience,labels,candidates"):
        out = _get(app, f"/img?fl={name}&layers={layers}")
        assert out[:8] == b"\x89PNG\r\n\x1a\n"


def test_webapp_salience_and_label_overlays(app):
    """Salience + label sibling products are discovered and composited
    (reference: collect_data, cmftagger.py:793-827)."""
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.core.labels import POINTSRC, rgb2labimg
    app_, name = app
    cmff = app_._resolve(name)
    d = os.path.dirname(cmff)
    # salience sibling
    sal = np.zeros((30, 20), np.float32)
    sal[10:14, 5:8] = 0.9
    envi_io.save_envi(os.path.join(d, name.replace("_cmf_", "_cmf_") +
                                   "_saliency.hdr"),
                      sal[..., None], interleave="bip")
    # label sibling (ENVI class map; loadlabimg expects *class)
    lab = np.zeros((30, 20), np.int16)
    lab[2:5, 2:5] = POINTSRC
    envi_io.save_envi(os.path.join(d, name + "_labclass.hdr"),
                      lab[..., None], interleave="bip")
    base = _get(app_, f"/img?fl={name}&layers=rgb")
    over = _get(app_, f"/img?fl={name}&layers=rgb,salience,labels")
    assert base != over     # overlays changed pixels
    from srcfinder_tpu.qc.webapp import _find_sibling
    assert _find_sibling(cmff, ("saliency",)) is not None
    assert _find_sibling(cmff, ("_lab",)) is not None


def test_webapp_flag_table_roundtrip(app):
    """Editable flightline-flag table -> *_lid.csv -> collect
    (reference: cmftagger.py:471-532)."""
    app_, name = app
    flags = json.loads(_get(app_, f"/api/flags?fl={name}"))
    assert "Coverage" in flags["columns"]
    assert flags["values"] == {}
    _post(app_, "/api/flags", {"fl": name, "values": {
        "Coverage": "good", "Clouds": "some", "Artifacts": "",
        "Usernotes": "looks fine"}})
    flags = json.loads(_get(app_, f"/api/flags?fl={name}"))
    assert flags["values"]["Coverage"] == "good"
    assert flags["values"]["Usernotes"] == "looks fine"
    # submit -> gather_submitted sees the flag row
    _post(app_, "/api/submit", {"fl": name})
    from srcfinder_tpu.qc.collect import gather_submitted
    cid, lid = gather_submitted(str(app_.session.output_dir))
    assert len(lid) == 1
    assert lid.iloc[0]["Coverage"] == "good"


def test_webapp_relabel(app):
    app_, name = app
    _post(app_, "/api/add", {"fl": name, "row": 11, "col": 6,
                             "label": "Plume"})
    rows = json.loads(_get(app_, f"/api/candidates?fl={name}"))
    cid = rows[0]["cid"]
    _post(app_, "/api/relabel", {"fl": name, "cid": cid,
                                 "label": "Artifact"})
    rows = json.loads(_get(app_, f"/api/candidates?fl={name}"))
    assert rows[0]["label"] == "Artifact"


def test_webapp_wmts_and_bounds(app):
    """WMTS basemap hook + georeferenced bounds (reference:
    cmftagger.py:60-74 + config/wmts.json)."""
    app_, name = app
    wmts = json.loads(_get(app_, "/api/wmts"))
    assert any("{z}" in v for v in wmts.values())
    b = json.loads(_get(app_, f"/api/bounds?fl={name}"))
    assert b["width"] == 20 and b["height"] == 30
    assert 30 < b["lat_min"] < b["lat_max"] < 40
    assert -125 < b["lon_min"] < b["lon_max"] < -110


def test_webapp_click_coordinate_mapping(app):
    """The browser-level contract: a click at CSS pixel (offsetX,
    offsetY) on the (integer-magnified, viewport-cropped) image must map
    to the intended image pixel. The page posts the RAW click event to
    /api/add (view + offsets + rendered size) and the server performs
    the only implementation of the mapping (webapp.click_to_pixel) — so
    this drives the exact path the browser uses, no JS re-derivation."""
    app_, name = app
    # zoomed viewport around (row 12, col 6): the zoomTo(64) window
    # clipped to the 20x30 image
    v = [2, 8, 12, 18]                       # x0, y0, x1, y1
    png = _get(app_, f"/img?fl={name}&layers=rgb,cmf"
                     f"&x0={v[0]}&y0={v[1]}&x1={v[2]}&y1={v[3]}")
    w, h = _png_size(png)
    # click in the middle of target pixel (col 6, row 12) on screen
    scale_x, scale_y = w / (v[2] - v[0]), h / (v[3] - v[1])
    off_x = (6 - v[0] + 0.5) * scale_x
    off_y = (12 - v[1] + 0.5) * scale_y
    _post(app_, "/api/add", {"fl": name, "view": v, "dims": [20, 30],
                             "offx": off_x, "offy": off_y,
                             "imgw": w, "imgh": h, "label": "Plume"})
    cands = json.loads(_get(app_, f"/api/candidates?fl={name}"))
    c = cands[-1]
    # server round-trips lat/lon -> (col,row) back to the clicked pixel
    assert abs(c["col"] - 6) < 1.0 and abs(c["row"] - 12) < 1.0


def test_webapp_view_endpoint(app):
    """Viewport navigation is server-side (/api/view): zoom halves the
    window around the center (floored at 16 px half-width), pan steps a
    quarter window, zoomTo centers a 64 px radius box — the page's
    buttons post here, so these ARE the buttons' semantics."""
    app_, name = app
    dims = [20, 30]
    # zoom in from the full image: center (10, 15), half-window (16, 16)
    r = _post(app_, "/api/view", {"op": "zoom", "view": None,
                                  "dims": dims, "f": 0.5})
    assert r["view"] == [-6, -1, 26, 31]
    # pan right by a quarter of the current window width
    r2 = _post(app_, "/api/view", {"op": "pan", "view": [0, 0, 16, 12],
                                   "dims": dims, "dx": 1, "dy": 0})
    assert r2["view"] == [4, 0, 20, 12]
    # zoomTo centers +-64 on the candidate
    r3 = _post(app_, "/api/view", {"op": "zoomTo", "view": None,
                                   "dims": dims, "x": 6, "y": 12})
    assert r3["view"] == [-58, -52, 70, 76]
    # the zoomed viewport still renders
    v = r3["view"]
    png = _get(app_, f"/img?fl={name}&layers=rgb,cmf"
                     f"&x0={v[0]}&y0={v[1]}&x1={v[2]}&y1={v[3]}")
    assert png[:4] == b"\x89PNG"


def test_page_js_server_contract():
    """Static contract between the page's JS and the server handlers
    (no JS engine exists in this env, so drift is caught structurally):
    every endpoint the script fetches must be routed by the handler, and
    the payload field names the JS posts must be exactly the keys the
    server reads (click_to_pixel / view_math / add / relabel / delete)."""
    import re
    from srcfinder_tpu.qc import webapp as W

    src = W._PAGE
    js = src[src.index("<script>"):src.rindex("</script>")]
    handler_src = open(W.__file__).read()

    # 1. every fetched endpoint is routed server-side
    endpoints = set(re.findall(r"j\('(/[a-z/]+)[?']", js))
    endpoints |= set(re.findall(r"'(/img)\?", js))
    assert endpoints, "no endpoints parsed from the page JS"
    for ep in endpoints:
        assert f'"{ep}"' in handler_src, f"JS fetches unrouted {ep}"

    # 2. the raw-click payload carries exactly what click_to_pixel needs
    add = re.search(r"/api/add.*?\{(.*?)\}\)\}", js, re.S).group(1)
    for key in ("fl", "view", "dims", "offx", "offy", "imgw", "imgh",
                "label"):
        assert re.search(rf"\b{key}:", add), f"addCand payload lost {key}"
    # offsets come from the DOM event, sizes from the rendered img tag
    assert "offx:e.offsetX" in add and "offy:e.offsetY" in add
    assert "imgw:img.width" in add and "imgh:img.height" in add

    # 3. view ops posted by the buttons are the ones view_math implements
    for op, args in (("zoom", "f:f"), ("pan", "dx:dx,dy:dy"),
                     ("zoomTo", "x:x,y:y")):
        assert re.search(rf"op:'{op}',{args}", js.replace(" ", "")), \
            f"JS no longer posts op={op} with {args}"
    # and setView always threads the current view + dims state through
    assert "Object.assign({view:view,dims:dims},body)" in js.replace(" ", "")

    # 4. no coordinate math may creep back into the JS: the page must not
    # compute pixel positions client-side (the round-2 weak spot)
    assert "naturalWidth" not in js and "Math.floor" not in js
