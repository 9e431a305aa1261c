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

    # image renders as PNG with 1:1 pixel mapping
    png = _get(app, f"/img?fl={name}")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    im = Image.open(io.BytesIO(png))
    assert im.size == (20, 30)       # (W, H)

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
