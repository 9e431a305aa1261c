"""QC tests: cid allocation, web mercator, flag CSVs, consensus machine,
session lifecycle, collect end-to-end."""

import os

import numpy as np
import pandas as pd
import pytest

from srcfinder_tpu import qc


def test_next_cid():
    df = pd.DataFrame({qc.CIDCOL: [], qc.LABCOL: []})
    assert qc.next_cid(qc.PLUMELAB, df) == "A"
    df = pd.DataFrame({qc.CIDCOL: ["A", "B"],
                       qc.LABCOL: [qc.PLUMELAB, qc.PLUMELAB]})
    assert qc.next_cid(qc.PLUMELAB, df) == "C"
    # numeric ids for negatives in byclass mode
    df2 = pd.DataFrame({qc.CIDCOL: ["A"], qc.LABCOL: [qc.PLUMELAB]})
    assert qc.next_cid(qc.FALSELAB, df2, byclass=True) == "1"


def test_classlabs():
    labs = [qc.PLUMELAB, qc.SUPERLAB, qc.FALSELAB, "Artifact"]
    np.testing.assert_array_equal(qc.classlabs(labs), [1, 1, 0, 0])


def test_web_mercator_roundtrip():
    x, y = qc.lnglat_to_meters(-118.5, 34.5)
    lng, lat = qc.meters_to_lnglat(x, y)
    assert abs(lng - (-118.5)) < 1e-9
    assert abs(lat - 34.5) < 1e-9
    # known anchor: lon 180 -> ~20037508 m
    x180, _ = qc.lnglat_to_meters(180.0, 0.0)
    assert abs(x180 - 20037508.34) < 1.0


def test_flag_csv_roundtrip(tmp_path):
    opts = ["Systematic Noise", "Clouds", "Specular"]
    f = str(tmp_path / "x_lid.csv")
    qc.save_flag_csv(f, ["Clouds"], opts, usernotes='some "notes"')
    flags, notes = qc.load_flag_csv(f, opts)
    assert list(flags) == ["Clouds"]
    assert "notes" in notes or notes == "some notes"


def test_lid2uidassign(tmp_path):
    df = pd.DataFrame({qc.LIDCOL: [f"ang{i}" for i in range(10)]})
    out = qc.lid2uidassign(df, ["alice", "bob"],
                           csvoutf=str(tmp_path / "a.csv"), seed=0)
    assert len(out) == 10
    counts = out[qc.UIDCOL].value_counts()
    assert set(counts.index) == {"alice", "bob"}
    assert counts.max() <= 5


@pytest.mark.parametrize("labels,expect", [
    ([qc.PLUMELAB], qc.PLUMELAB),
    ([qc.PLUMELAB, qc.PLUMELAB], qc.PLUMELAB),
    ([qc.PLUMELAB, qc.SUPERLAB], qc.SUPERLAB),
    ([qc.FALSELAB, "Artifact"], qc.FALSELAB),
    ([qc.PLUMELAB, qc.FALSELAB], qc.AMBLAB),
    ([qc.PLUMELAB, qc.AMBLAB], qc.AMBLAB),
    ([qc.AMBLAB, "Duplicate"], qc.AMBLAB),
    ([qc.PLUMELAB, qc.REJLAB], qc.REJLAB),
])
def test_consensus_label(labels, expect):
    assert qc.consensus_label(labels) == expect


def test_consensus_candidates():
    df = pd.DataFrame({
        qc.LIDCOL: ["l1", "l1", "l1", "l1", "l2"],
        qc.CIDCOL: ["A", "A", "B", "B", "A"],
        qc.LABCOL: [qc.PLUMELAB, qc.SUPERLAB, qc.PLUMELAB, qc.FALSELAB,
                    qc.FALSELAB],
        qc.UIDCOL: ["u1", "u2", "u1", "u2", "u1"],
    })
    out = qc.consensus_candidates(df)
    a = out[(out[qc.LIDCOL] == "l1") & (out[qc.CIDCOL] == "A")]
    assert (a[qc.LABCOL] == qc.SUPERLAB).all()
    assert (a[qc.CLSCOL] == 1).all()
    assert (a[qc.EVALCOL] == "TP").all()
    b = out[(out[qc.LIDCOL] == "l1") & (out[qc.CIDCOL] == "B")]
    assert (b[qc.LABCOL] == qc.AMBLAB).all()
    assert (b[qc.CLSCOL] == 0).all()
    c = out[out[qc.LIDCOL] == "l2"]
    assert (c[qc.CLSCOL] == -1).all()
    assert (c[qc.EVALCOL] == "FP").all()


def test_session_lifecycle(tmp_path):
    data = tmp_path / "data"
    os.makedirs(data)
    for lid in ("ang20200924t211102", "ang20200925t120000"):
        (data / f"{lid}_cmf_v2y1_img").write_bytes(b"")
    out = tmp_path / "output"
    sess = qc.QcSession("alice", str(data), str(out))
    assert len(sess.todo) == 2

    cmff = sess.todo[0]
    ciddf = sess.load_candidates(cmff)
    ciddf = sess.add_candidate(ciddf, cmff, 34.5, -118.5, qc.PLUMELAB)
    ciddf = sess.add_candidate(ciddf, cmff, 34.6, -118.6, qc.SUPERLAB)
    assert list(ciddf[qc.CIDCOL]) == ["A", "B"]
    ciddf = sess.delete_candidate(ciddf, "B")
    assert list(ciddf[qc.CIDCOL]) == ["A"]
    sess.autosave(cmff, ciddf, lid_flags={"Clouds": 0})
    # reload picks up autosaved state
    back = sess.load_candidates(cmff)
    assert list(back[qc.CIDCOL].astype(str)) == ["A"]

    sess.submit(cmff)
    assert len(sess.todo) == 1 and len(sess.done) == 1
    assert os.path.isfile(os.path.join(str(out), "alice", "submitted",
                                       os.path.basename(cmff) + "_cid.csv"))
    assert "submitted" in sess.log.text()


def test_collect_qcdata_end_to_end(tmp_path):
    out = tmp_path / "output"
    for user, lab in [("u1", qc.PLUMELAB), ("u2", qc.FALSELAB)]:
        sub = out / user / "submitted"
        os.makedirs(sub)
        pd.DataFrame({
            qc.LIDCOL: ["l1", "l1"], qc.CIDCOL: ["A", "B"],
            qc.LABCOL: [lab, qc.PLUMELAB],
        }).to_csv(sub / "l1_cmf_img_cid.csv", index=False)
        pd.DataFrame({
            qc.LIDCOL: ["l1"], "Coverage": ["good"],
        }).to_csv(sub / "l1_cmf_img_lid.csv", index=False)

    lidfilters = {"Coverage": {"accept": ["good"], "reject": ["bad"]}}
    ciddf, liddf = qc.collect_qcdata(str(out), lidfilters,
                                     str(tmp_path / "camp"))
    # candidate A: plume vs false -> ambiguous -> dropped from final set
    assert (ciddf[qc.CIDCOL] == "B").all()
    assert (ciddf[qc.CLSCOL] == 1).all()
    assert os.path.isfile(str(tmp_path / "camp")
                          + "_cid_filt_nodup_norej_noamb.csv")


def test_circular_buffer():
    buf = qc.CircularBuffer(3)
    for i in range(5):
        buf.append(i)
    assert list(buf) == [2, 3, 4]
    assert len(buf) == 3
    assert buf[0] == 2


def test_collect_cli(tmp_path):
    import json
    from srcfinder_tpu.qc import collect_cli
    out = tmp_path / "output"
    sub = out / "u1" / "submitted"
    os.makedirs(sub)
    pd.DataFrame({qc.LIDCOL: ["l1"], qc.CIDCOL: ["A"],
                  qc.LABCOL: [qc.PLUMELAB]}).to_csv(
        sub / "l1_cmf_img_cid.csv", index=False)
    pd.DataFrame({qc.LIDCOL: ["l1"], "Coverage": ["good"]}).to_csv(
        sub / "l1_cmf_img_lid.csv", index=False)
    lidf = tmp_path / "lidfilters.json"
    lidf.write_text(json.dumps(
        {"Coverage": {"accept": ["good"], "reject": ["bad"]}}))
    rc = collect_cli.main([str(out), "--lidfilters", str(lidf),
                           "--outprefix", str(tmp_path / "camp")])
    assert rc == 0
    final = pd.read_csv(str(tmp_path / "camp")
                        + "_cid_filt_nodup_norej_noamb.csv")
    assert len(final) == 1 and final.iloc[0][qc.CLSCOL] == 1


def test_save_classlabs(tmp_path):
    import json
    from srcfinder_tpu.qc.labels import save_classlabs
    f = save_classlabs(str(tmp_path / "classlabs.json"))
    d = json.load(open(f))
    assert d["positive"] == [qc.PLUMELAB, qc.SUPERLAB]
    assert "Ambiguous" in d["ambiguous"]


def test_gtif_cache_roundtrip(tmp_path, rng):
    """EPSG:3857 warp cache (reference: cmftagger/util.py:408-489):
    georeferencing verified by inverse-projecting a known pixel, LZW
    GeoTIFF output, idempotent cache, lockfile protocol, parallel
    precache."""
    import time
    import threading
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.core.geo import sl2latlon
    from srcfinder_tpu.qc.gtif import (img_to_gtif, load_cache_gtif,
                                       precache_gtifs)
    from srcfinder_tpu.qc.labels import lnglat_to_meters

    h, w = 40, 30
    dat = np.zeros((h, w, 4), np.float32)
    dat[..., 3] = np.arange(h * w, dtype=np.float32).reshape(h, w)
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "391000", "3786000", "3.0",
                         "3.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    imgf = str(tmp_path / "ang_x_cmf_img")
    envi_io.save_envi(imgf + ".hdr", dat, metadata=meta, interleave="bip")
    cache = str(tmp_path / "gtifs")

    arr, gmeta = load_cache_gtif(imgf, cache)
    assert gmeta["epsg"] == 3857
    assert arr.shape[2] == 4
    gt = gmeta["geotransform"]
    # pick the source pixel (line 10, sample 7), project to mercator,
    # find its target cell, and check the nearest-sampled value
    lat, lon = sl2latlon(7.0, 10.0, mapinfo={
        "proj": "UTM", "ulx": 391000.0, "uly": 3786000.0, "xps": 3.0,
        "yps": 3.0, "zone": "11", "hemi": "North", "rotation": 0.0})
    mx, my = lnglat_to_meters(float(lon), float(lat))
    j = int(round((mx - gt[0]) / gt[1] - 0.5))
    i = int(round((my - gt[3]) / gt[5] - 0.5))
    assert arr[i, j, 3] == dat[10, 7, 3]

    # idempotent: second call reuses the file (same mtime)
    outf = img_to_gtif(imgf, cache)
    m1 = os.path.getmtime(outf)
    img_to_gtif(imgf, cache)
    assert os.path.getmtime(outf) == m1

    # lockfile: a held lock blocks until released, then reuses
    lock = outf + ".lock"
    os.remove(outf)
    with open(lock, "w"):
        pass
    def release():
        time.sleep(0.3)
        from srcfinder_tpu.core.geotiff import write_geotiff
        write_geotiff(outf, np.zeros((2, 2), np.float32))
        os.remove(lock)
    t = threading.Thread(target=release)
    t.start()
    got = img_to_gtif(imgf, cache)
    t.join()
    assert got == outf and os.path.isfile(outf)

    # parallel precache over two images
    imgf2 = str(tmp_path / "ang_y_cmf_img")
    envi_io.save_envi(imgf2 + ".hdr", dat, metadata=meta,
                      interleave="bip")
    outs = precache_gtifs([imgf, imgf2], cache, workers=2,
                          overwrite=True)
    assert all(os.path.isfile(o) for o in outs) and len(outs) == 2
