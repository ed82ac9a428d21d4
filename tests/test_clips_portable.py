"""clips_validate_portable: the engine's end-to-end violation multiset over
the portable clip table must equal an engine-independent python recompute
(hashlib md5 + first-principles rule logic — no Spark, no DuckDB)."""

import hashlib
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"

SR_SET = {"8000", "16000", "22050", "44100", "48000"}
CODECS = {"opus", "flac", "pcm_s16le", "mp3"}


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hex(s: str, n: int) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:n]


def _expected_violations(doc_ids):
    rows = []
    for d in doc_ids:
        band = _h(f"{d}:band") % 100
        if band < 4:
            cid = "clip_" + _hex(f"{_h(f'{d}:pool') % 8}:dpool", 16)
        elif band < 7:
            cid = None
        elif band < 10:
            cid = "clip_" + _hex(f"{d}:id", 16).upper()
        else:
            cid = "clip_" + _hex(f"{d}:id", 16)
        sr = 12345 if 10 <= band <= 12 else [8000, 16000, 22050, 44100, 48000][_h(f"{d}:sr") % 5]
        if 13 <= band <= 14:
            dur = 0 - _h(f"{d}:neg") % 100
        elif band == 15:
            dur = 3_600_001 + _h(f"{d}:big") % 1000
        else:
            dur = 500 + _h(f"{d}:dur") % 30000
        codec = "speex" if 16 <= band <= 18 else ["opus", "flac", "pcm_s16le", "mp3"][_h(f"{d}:c") % 4]
        part = f"p{_h(f'{d}:p') % 8:02d}"
        canon = None if cid is None else "txt_" + _hex(f"{cid}:t", 12)
        transcript = canon + "_x" if (cid is not None and 21 <= band <= 23) else canon
        rows.append((band, cid, sr, dur, codec, part, transcript))

    dim = {}
    for band, cid, *_ in rows:
        if cid is not None and not 19 <= band <= 20:
            dim[cid] = "txt_" + _hex(f"{cid}:t", 12)
    counts = Counter(cid for _, cid, *_ in rows if cid is not None)

    v = []
    for band, cid, sr, dur, codec, part, transcript in rows:
        if cid is None:
            v.append(("PCLIP_NOT_NULL", None, part, "<blank>"))
        else:
            hexpart = cid[5:]
            if not (len(hexpart) == 16 and all(c in "0123456789abcdef" for c in hexpart)):
                v.append(("PCLIP_FORMAT", cid, part, cid))
        if str(sr) not in SR_SET:
            v.append(("PSR_WHITELIST", cid, part, str(sr)))
        if dur < 1 or dur > 3_600_000:
            v.append(("PDUR_RANGE", cid, part, str(dur)))
        if codec not in CODECS:
            v.append(("PCODEC_WHITELIST", cid, part, codec))
        if cid is not None and counts[cid] > 1:
            v.append(("PCLIP_UNIQUE", cid, part, f"dup_count={counts[cid]}"))
        if cid is not None and cid not in dim:
            v.append(("PTRANSCRIPT_FK", cid, part, cid))
        if cid is not None and cid in dim and (transcript or "") != dim[cid]:
            v.append(("PTRANSCRIPT_MATCH", cid, part, (transcript or "<null>")[:64]))
    for cid, n in counts.items():
        if n > 1:
            v.append(("PCLIP_DUP_VALUES", cid, None, f"dup_count={n}"))
    return Counter(v)


def test_portable_engine_matches_python_recompute(spark):
    from data_check_spark.queries import QUERIES

    doc_ids = [r["doc_id"] for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").collect()]
    expected = _expected_violations(doc_ids)
    got = Counter(
        (r["rule_id"], r["clip_id"], r["partition"], r["observed"])
        for r in QUERIES["clips_validate_portable"](spark, SF_DIR).collect()
    )
    assert got == expected
    assert sum(expected.values()) > 0  # the planted bands must actually fire
