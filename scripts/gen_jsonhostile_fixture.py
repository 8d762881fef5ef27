"""Build the hostile-JSON / NUL-text fixture (round-8 lenient-parser sweep).

The fixture's events feed carries uniform compact `{"k": N}` payloads.
A real 100 TB event transport does not: upstream producers ship raw
control characters inside strings, lone-surrogate escapes, trailing
commas, bare NaN/Infinity literals, and single-quoted pseudo-JSON —
and the two engines' parsers disagree on them in BOTH directions
(Spark/Jackson is lenient where DuckDB/yyjson is strict about control
chars, surrogates, single quotes; yyjson is lenient where Jackson is
strict about trailing commas and NaN/Infinity). portable.json_int /
json_int_sql close the gap with a shared raw-byte hostile gate
(portable.HOSTILE_JSON_RE); this script injects every probed variant
into ~events.props (deterministic by event_id residue) plus NUL bytes
into documents.text so the full registry can be swept through the
spark-vs-DuckDB compare:

    python scripts/gen_jsonhostile_fixture.py /root/testdata/sf0.01 /tmp/jsonhostile_sf
    python -m tests.harness --sf /tmp/jsonhostile_sf

Both mutation functions are imported by tests/test_jsonhostile_fixture.py
so the sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem embeddings"
).split()

_BS = "\\"
NUL = chr(0)

# (residue mod 41, payload builder). Residues chosen so every variant
# lands inside the event_id <= 3000 slice json_to_map reads at sf0.01.
# `k` stays extractable on CLEAN variants so value-bearing paths are
# exercised, and hostile variants carry a would-be-divergent k.
HOSTILE_PROPS = {
    2: lambda k: '{"k":' + str(k) + ',"n":"a' + chr(0) + 'b"}',   # raw NUL in str
    4: lambda k: '{"k":' + str(k) + ',"n":"a' + chr(9) + 'b"}',   # raw TAB in str
    6: lambda k: '{"k":' + str(k) + ',"n":"a' + chr(10) + 'b"}',  # raw LF in str
    8: lambda k: '{ "k" :' + chr(10) + chr(9) + str(k) + " }",    # ws between tokens
    10: lambda k: '{"k":' + str(k) + ',"n":"' + _BS + 'ud800"}',  # lone surrogate
    12: lambda k: '{"k":' + str(k) + ',"n":"' + _BS + "ud83d" + _BS + 'ude00"}',  # pair
    14: lambda k: '{"k":' + str(k) + ",}",                        # trailing comma
    16: lambda k: '{"k":' + str(k) + ',"n":NaN}',                 # NaN literal
    18: lambda k: '{"k":' + str(k) + ',"n":Infinity}',            # Infinity literal
    20: lambda k: "{'k':" + str(k) + "}",                         # single-quoted
    22: lambda k: '{"k":' + str(k) + ',"n":"it' + "'" + 's"}',    # clean apostrophe
    24: lambda k: '{"k":' + str(k) + ',"n":"a' + _BS + 'u0000b"}',  # escaped NUL (clean)
    26: lambda k: '{"k":' + str(k) + ',"n":"a,}b"}',              # ,} inside str
    28: lambda k: '{"k":' + str(k) + ',"n":1e999999}',            # huge exponent (clean)
    30: lambda k: '{"k":' + str(k) + ',"k":' + str(k + 7) + "}",  # dup key
    32: lambda k: '{"k":' + str(k) + ',"n":"' + _BS + _BS + 'ud800b"}',  # literal \u text
    34: lambda k: '{"k":' + str(k) + ',"n":"NaN"}',               # NaN inside str
    36: lambda k: '{"k":"' + str(k) + '"}',                       # quoted int (clean)
    # nesting-depth class (round 9): Jackson caps depth ~1000 and
    # NULLs the whole payload where yyjson extracts fine — gated by
    # the MAX_JSON_OPENERS length proxy (portable.py)
    38: lambda k: '{"k":' + str(k) + ',"d":' + '{"a":' * 1200 + "1" + "}" * 1200 + "}",
    40: lambda k: '{"k":' + str(k) + ',"a":[' + '{"b":1},' * 949 + '{"b":1}]}',
    5: lambda k: '{"k":' + str(k) + ',"d":{"a":{"b":{"c":{"e":1}}}}}',  # clean nested
    # integral-cast class (round 10): DuckDB TRY_CAST rounds
    # fractional/exponent strings where ANSI Spark NULLs them —
    # hostile through the _INTEGRAL_RE oracle guard, NULL both sides
    1: lambda k: '{"k":' + str(k) + ".5}",                        # fractional value
    3: lambda k: '{"k":' + str(k) + "e1}",                        # exponent value
    7: lambda k: '{"k":"' + str(k) + '.5"}',                      # quoted fractional
    # number-token-length class (round 10): Jackson's ~1000-char
    # number cap NULLs the whole payload; yyjson extracts fine —
    # gated by the MAX_JSON_DIGITS total-digit proxy
    9: lambda k: '{"k":' + str(k) + ',"pad":' + "7" * 1200 + "}",  # long sibling number
    11: lambda k: '{"k":' + "1" * 1100 + "}",                      # long k itself
    # field-name-length class (round 10): Jackson's 50k name cap —
    # gated by MAX_JSON_LENGTH
    13: lambda k: '{"' + "a" * 60000 + '":1,"k":' + str(k) + "}",
    15: lambda k: '{"k":" ' + str(k) + ' "}',                      # spaced quoted int (clean)
    17: lambda k: '{"k":' + str(k) + ',"a":[' + "11," * 470 + "11]}",  # >900 digits spread
}


def write_hostile_events(src: str, dst_path: str) -> None:
    """The canonical hostile-JSON mutation over events.props."""
    t = pq.read_table(src)
    cols = {n: t.column(n) for n in t.schema.names}
    ids = cols["event_id"].to_pylist()
    props = cols["props"].to_pylist()
    out = []
    for i, p in zip(ids, props):
        builder = HOSTILE_PROPS.get(i % 41)
        out.append(builder(i % 97) if builder else p)
    arrays = [
        pa.array(out, pa.string()) if n == "props" else cols[n]
        for n in t.schema.names
    ]
    pq.write_table(pa.table(dict(zip(t.schema.names, arrays))), dst_path)


def write_nul_documents(src: str, dst_path: str) -> None:
    """The canonical NUL-byte mutation over documents.text: NUL mid-word
    (splits a token in neither dialect — not whitespace in either),
    NUL-only doc, NUL at boundaries, NUL adjacent to multibyte text."""
    t = pq.read_table(src)
    cols = {n: t.column(n) for n in t.schema.names}
    ids = cols["doc_id"].to_pylist()
    texts = cols["text"].to_pylist()
    out = []
    for i, x in zip(ids, texts):
        r = i % 19
        if r == 3:
            out.append("alpha" + NUL + "beta gamma")
        elif r == 7:
            out.append(NUL)
        elif r == 11:
            out.append(NUL + (x or "") + NUL)
        elif r == 15:
            out.append("café" + NUL + "中文")
        else:
            out.append(x)
    arrays = [
        pa.array(out, pa.string()) if n == "text" else cols[n]
        for n in t.schema.names
    ]
    pq.write_table(pa.table(dict(zip(t.schema.names, arrays))), dst_path)


def build(src_dir: str, dst_dir: str) -> None:
    for name in TABLES:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    write_hostile_events(f"{src_dir}/events.parquet", f"{dst_dir}/events.parquet")
    write_nul_documents(f"{src_dir}/documents.parquet", f"{dst_dir}/documents.parquet")


if __name__ == "__main__":
    import os

    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    build(src, dst)
    print(f"wrote hostile-JSON fixture to {dst}")
