"""Deterministic synthetic pages corpus + golden expected outputs.

Implements FIXTURES.md: a seeded generator producing the authoritative input
shape (url, warc_ts, html, text, lang) where each document embeds one log-body
template family drawn from the reference's own test vectors, plus the golden
``expected_problems`` rows derived by construction. Everything is a pure
function of the document sequence number — no wall clock, no RNG state shared
across rows — so the corpus is reproducible at any scale and on any executor.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd

from .core.problems import canonical_json

LANGS = ["en", "de", "fr", "pt", "ja"]

# benign padding vocabulary: lowercase, no punctuation, chosen to avoid every
# gate token and anchor (verified by test_fixtures_padding_is_no_match)
_PAD_WORDS = [
    "alpha", "beta", "gamma", "delta", "omega", "river", "stone", "cloud",
    "forest", "ember", "quiet", "gentle", "harbor", "meadow", "willow",
]


def _pad_line(i: int, j: int) -> str:
    w = _PAD_WORDS
    n = len(w)
    return " ".join(
        w[(i * 7 + j * 3 + k * 5) % n] for k in range(6 + (i + j) % 5)
    )


# Padding multiplier. 1 for the correctness corpus (goldens' linenos assume
# it); bench raises it so documents are realistically log-sized and per-task
# compute dominates scheduler overhead. Worker-process-local (each Python
# worker is single-threaded), set via pages_df(pad_scale=…).
PAD_SCALE = 1


def _padding(i: int, count: int) -> list[str]:
    count = count * PAD_SCALE
    return [_pad_line(i, j) for j in range(count)]


# ---------------------------------------------------------------------------
# Template families. Each returns (lines, expected) where expected is None
# (no-match doc) or a dict with problem_kind/lineno/match_line/origin/details
# fields describing the golden classification (lineno relative to the doc,
# 1-based).
# ---------------------------------------------------------------------------


def _fam_nomatch(i: int):
    return _padding(i, 8 + i % 13), None


def _fam_python_module(i: int):
    mod = f"mod{i % 23}"
    pre = _padding(i, 3 + i % 6)
    line = f"ModuleNotFoundError: No module named '{mod}'"
    lines = pre + [line] + _padding(i + 1, i % 3)
    return lines, {
        "problem_kind": "missing-python-module",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"module": mod, "python_version": 3, "minimum_version": None},
    }


def _fam_make_target(i: int):
    target = f"obj{i % 17}.o"
    needed = f"all{i % 5}"
    pre = _padding(i, 2 + i % 4)
    line = (
        f"make[1]: *** No rule to make target '{target}', needed by '{needed}'.  Stop."
    )
    lines = pre + [line]
    return lines, {
        "problem_kind": "missing-make-target",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"target": target, "required_by": needed},
    }


def _fam_command_missing(i: int):
    cmd = f"tool{i % 19}"
    pre = _padding(i, 1 + i % 7)
    line = f"/bin/sh: 1: {cmd}: not found"
    lines = pre + [line] + _padding(i + 2, i % 2)
    return lines, {
        "problem_kind": "command-missing",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"command": cmd},
    }


def _fam_c_header(i: int):
    hdr = f"lib{i % 11}.h"
    pre = _padding(i, 4)
    line = f"src{i % 3}.c:12:3: fatal error: {hdr}: No such file or directory"
    lines = pre + [line]
    return lines, {
        "problem_kind": "missing-c-header",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"header": hdr},
    }


def _fam_secondary_only(i: int):
    pre = _padding(i, 2 + i % 5)
    line = f"make: *** [all{i % 4}] Error 2"
    lines = pre + [line]
    return lines, {
        "problem_kind": None,
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": None,
    }


def _fam_no_space(i: int):
    pre = _padding(i, 3)
    line = f"cp: /var/tmp/out{i % 9}: No space left on device"
    lines = pre + [line]
    return lines, {
        "problem_kind": "no-space-on-device",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {},
    }


def _fam_vignette(i: int):
    dep = f"vigdep{i % 7}"
    pre = _padding(i, 2)
    l1 = f"Error: processing vignette 'intro{i % 3}.Rnw' failed with diagnostics:"
    l2 = f"{dep} is not available"
    lines = pre + [l1, l2]
    return lines, {
        "problem_kind": "missing-vague-dependency",
        "lineno": len(pre) + 2,
        "match_line": l2,
        "details": {
            "name": dep, "url": None, "minimum_version": None, "current_version": None,
        },
    }


def _fam_perl_module(i: int):
    mod = f"Acme::Fam{i % 13}"
    pre = _padding(i, 1 + i % 3)
    l1 = "# The following modules are not available."
    l2 = "# `perl Makefile.PL | cpanm` will install them:"
    l3 = f"  {mod}"
    lines = pre + [l1, l2, l3]
    return lines, {
        "problem_kind": "missing-perl-module",
        "lineno": len(pre) + 3,
        "match_line": l3,
        "details": {
            "filename": None, "module": mod, "inc": None, "minimum_version": None,
        },
    }


def _fam_haskell_deps(i: int):
    dep1 = f"hpkg{i % 5} >=1.{i % 4}"
    dep2 = f"hextra{i % 3} <2"
    pre = _padding(i, 2)
    l1 = f"Setup{i % 2}: Encountered missing or private dependencies:"
    l2 = f"    {dep1},"
    l3 = f"    {dep2},"
    lines = pre + [l1, l2, l3, ""]
    return lines, {
        "problem_kind": "missing-haskell-dependencies",
        "lineno": len(pre) + 3,  # MultiLineMatch.lineno = last offset + 1
        "match_line": l3,
        "details": {"deps": [dep1, dep2]},
    }


def _fam_cmake(i: int):
    name = f"Pkg{i % 9}"
    comp = f"comp{i % 4}"
    pre = _padding(i, 2)
    lines = pre + [
        f"CMake Error at CMakeLists.txt:{10 + i % 40} (find_package):",
        f"  Could NOT find {name} (missing: {comp})",
        "",
    ]
    return lines, {
        "problem_kind": "missing-cmake-components",
        "lineno": len(pre) + 2,
        "match_line": f"  Could NOT find {name} (missing: {comp})",
        "details": {"name": name, "components": [comp]},
    }


def _fam_ruby_gem(i: int):
    gem = f"gemfam{i % 8}"
    ver = f"1.{i % 6}"
    pre = _padding(i, 3)
    line = f"Could not find gem '{gem} (>= {ver})', which is required by gem 'top{i % 2}'."
    lines = pre + [line]
    return lines, {
        "problem_kind": "missing-ruby-gem",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"gem": gem, "version": ver},
    }


def _fam_pkg_config(i: int):
    mod = f"libfam{i % 6}"
    ver = f"0.{i % 9}"
    pre = _padding(i, 2)
    line = f"configure: error: Package requirements ({mod} >= {ver}) were not met:"
    lines = pre + [line]
    return lines, {
        "problem_kind": "missing-pkg-config-package",
        "lineno": len(pre) + 1,
        "match_line": line,
        "details": {"module": mod, "minimum_version": ver},
    }


def _fam_sbuild_build(i: int):
    """Miniature sbuild container: Build section with an embedded error and a
    Summary with Fail-Stage: build (cf. /root/reference/src/testdata/sbuild.0.log)."""
    sep = "+" + "-" * 78 + "+"
    mod = f"sbmod{i % 7}"
    err = f"ModuleNotFoundError: No module named '{mod}'"
    build_body = _padding(i, 3) + [err] + _padding(i + 1, 1)
    lines = (
        ["preamble noise " + _pad_line(i, 0)]
        + [sep, "| Build                                                                        |", sep]
        + build_body
        + [sep, "| Summary                                                                      |", sep]
        + ["Fail-Stage: build"]
    )
    # lineno = section begin offset + match lineno within section
    # (src/sbuild.rs:506-512): preamble(1) + header triplet(3) gives
    # begin_offset 4; error is the 4th section line → absolute line 8
    return lines, {
        "problem_kind": "missing-python-module",
        "match_line": err,
        "details": {"module": mod, "python_version": 3, "minimum_version": None},
        "stage": "build",
        "phase": "build",
        "container": "sbuild",
        "lineno": 8,
    }


def _fam_sbuild_cudf(i: int):
    """sbuild container whose install-deps stage fails with a dose3 CUDF
    block (cf. /root/reference/src/testdata/sbuild-cudf.log,
    src/apt.rs:282-355)."""
    sep = "+" + "-" * 78 + "+"
    dep = f"librust-dep{i % 5}-dev:amd64 (>= 0.{i % 9}.1-~~)"
    section_body = [
        "Attempting to resolve dependencies...",
        "output-version: 1.2",
        "native-architecture: amd64",
        "report:",
        " -",
        "  package: sbuild-build-depends-main-dummy",
        "  version: 0.invalid.0",
        "  architecture: amd64",
        "  status: broken",
        "  reasons:",
        "   -",
        "    missing:",
        "     pkg:",
        "      package: sbuild-build-depends-main-dummy",
        "      version: 0.invalid.0",
        "      architecture: amd64",
        f"      unsat-dependency: {dep}",
        "",
        "after the block",
    ]
    title = "install dose3 build dependencies (aspcud-based resolver)"
    header = f"| {title}" + " " * max(1, 77 - len(title) - 2) + "|"
    lines = (
        ["preamble"]
        + [sep, header, sep]
        + section_body
        + [sep, "| Summary" + " " * 69 + "|", sep]
        + ["Fail-Stage: install-deps"]
    )
    # CUDF block: section lines idx 1..16 (0-based); MultiLineMatch lineno =
    # last offset + 1 = 17 within the section; section begin_offset = 4
    return lines, {
        "problem_kind": "unsatisfied-apt-dependencies",
        "match_line": f"      unsat-dependency: {dep}",
        "details": {"relations": dep},
        "stage": "install-deps",
        "phase": "build",
        "container": "sbuild",
        "lineno": 4 + 17,
    }


def _fam_autopkgtest_stderr(i: int):
    """autopkgtest summary FAIL stderr: <unauthorized output>
    (src/autopkgtest.rs:627-692)."""
    test = f"case{i % 4}"
    out = f"unexpected warning {i % 7}"
    lines = [
        f"autopkgtest [11:2{i % 10}:00]: @@@@@@@@@@@@@@@@@@@@ summary",
        f"{test}               FAIL stderr: {out}",
    ]
    return lines, {
        "problem_kind": "stderr-output",
        "lineno": 2,
        "match_line": f"{test}               FAIL stderr: {out}",
        "details": {"stderr_line": out},
        "container": "autopkgtest",
        "phase": "autopkgtest",
        "phase_test": test,
    }


def _fam_autopkgtest_timeout(i: int):
    test = f"unit{i % 5}"
    lines = [
        f"autopkgtest [10:0{i % 6}:00]: @@@@@@@@@@@@@@@@@@@@ summary",
        f"{test}               FAIL timed out",
    ]
    return lines, {
        "problem_kind": "timed-out",
        "lineno": 2,
        "match_line": f"{test}               FAIL timed out",
        "details": {},
        "container": "autopkgtest",
        "phase": "autopkgtest",
        "phase_test": test,
    }


# (family_fn, weight) — weights drive realistic skew: the no-match majority
# class plus a dominant missing-python-module family (FIXTURES.md §3.6)
FAMILIES = [
    (_fam_nomatch, 40),
    (_fam_python_module, 18),
    (_fam_make_target, 8),
    (_fam_command_missing, 8),
    (_fam_c_header, 5),
    (_fam_secondary_only, 5),
    (_fam_no_space, 3),
    (_fam_vignette, 2),
    (_fam_perl_module, 2),
    (_fam_haskell_deps, 2),
    (_fam_cmake, 2),
    (_fam_ruby_gem, 1),
    (_fam_pkg_config, 1),
    (_fam_sbuild_build, 2),
    (_fam_sbuild_cudf, 1),
    (_fam_autopkgtest_timeout, 1),
    (_fam_autopkgtest_stderr, 1),
]
_TOTAL_WEIGHT = sum(w for _, w in FAMILIES)
_WHEEL = []
for _fam, _w in FAMILIES:
    _WHEEL.extend([_fam] * _w)

EPOCH_TS = pd.Timestamp("2024-01-01T00:00:00")


def family_for(i: int):
    return _WHEEL[(i * 131) % _TOTAL_WEIGHT]


def make_doc(i: int) -> tuple[dict, Optional[dict]]:
    """Returns (page_row, golden_row_or_None)."""
    fam = family_for(i)
    lines, expected = fam(i)
    text = "\n".join(lines) + "\n"
    url = f"https://logs.example.org/{fam.__name__[5:]}/{i:08d}"
    lang = LANGS[i % len(LANGS)]
    import html as _html

    page = {
        "url": url,
        "warc_ts": EPOCH_TS + pd.Timedelta(seconds=60 * i),
        "html": (
            "<html><body><pre>" + _html.escape(text) + "</pre></body></html>"
        ).encode("utf-8"),
        "text": text,
        "lang": lang,
    }
    golden = None
    if expected is not None:
        golden = {
            "url": url,
            "lang": lang,
            "problem_kind": expected.get("problem_kind"),
            "lineno": expected.get("lineno"),
            "match_line": expected.get("match_line"),
            "details": (
                canonical_json(expected["details"])
                if expected.get("details") is not None
                else None
            ),
            "container": expected.get("container", "plain"),
            "stage": expected.get("stage"),
            "phase": expected.get("phase"),
        }
    return page, golden


def pages_pdf(start: int, end: int) -> pd.DataFrame:
    rows = [make_doc(i)[0] for i in range(start, end)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def golden_pdf(start: int, end: int) -> pd.DataFrame:
    rows = []
    for i in range(start, end):
        _, g = make_doc(i)
        if g is not None:
            rows.append(g)
    return pd.DataFrame(
        rows,
        columns=[
            "url", "lang", "problem_kind", "lineno", "match_line", "details",
            "container", "stage", "phase",
        ],
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n: int, partitions: Optional[int] = None, pad_scale: int = 1):
    """Distributed deterministic generation: spark.range → mapInPandas.
    No driver-side materialization; each executor derives its rows from the
    sequence number alone. pad_scale≠1 invalidates the golden linenos — use
    only for benchmarking."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import buildlog_consultant_spark.fixtures as fx

        fx.PAD_SCALE = pad_scale
        try:
            for pdf in batches:
                ids = pdf["id"].tolist()
                yield pd.DataFrame(
                    [make_doc(int(i))[0] for i in ids],
                    columns=["url", "warc_ts", "html", "text", "lang"],
                )
        finally:
            fx.PAD_SCALE = 1

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def make_media(i: int) -> tuple[dict, dict]:
    """Deterministic media row i: real BMP / WAV / PNG / baseline-JPEG /
    MP4-header bytes, plus one 'unknown' blob in every 16 (i%8: even→BMP,
    1→WAV, 3→JPEG [i%16==11: header-only prefix, else full baseline
    scan], 5→PNG, 7→MP4 header when i%16==7 else unknown). Returns
    (row, golden) where golden carries the
    BY-CONSTRUCTION expectations (stats computed from the generating
    arrays — for JPEG via the 1-pixel color-transform replay, since a
    solid-color image survives the all-ones-quant DCT round-trip exactly
    — independently of the decoders in ops/multimodal.py)."""
    import math

    import numpy as np

    from .ops.multimodal import (
        encode_bmp,
        encode_jpeg,
        encode_jpeg_header,
        encode_png,
        encode_wav,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    url = f"media://{i:06d}"
    kind = i % 8
    if kind == 7:
        if i % 16 == 7:
            # MP4 header: real tkhd dims + mvhd duration, no samples
            w, h = 320 + (i % 5) * 16, 180 + (i % 3) * 60
            dur = 1000 + (i % 11) * 500
            golden = {
                "url": url, "media_type": "video/mp4",
                "width": w, "height": h, "duration_ms": dur,
            }
            from .ops.multimodal import encode_mp4_header

            return {"url": url, "media": encode_mp4_header(w, h, dur)}, golden
        data = (b"\x89OPAQUE" + bytes([(i * 37 + j) % 256 for j in range(64)]))
        golden = {"url": url, "media_type": "unknown"}
        return {"url": url, "media": data}, golden
    if kind == 3:
        if i % 16 == 11:
            # header-level JPEG: real SOF dimensions, no scan data —
            # exercises the decoder's header-fallback path
            w, h = 160 + (i % 9) * 8, 120 + (i % 5) * 6
            golden = {
                "url": url, "media_type": "image/jpeg", "width": w, "height": h,
            }
            return {"url": url, "media": encode_jpeg_header(w, h, seed=i)}, golden
        # FULL baseline JPEG: solid color, so the expected means are the
        # JFIF color-transform round-trip of the source color (exact by
        # construction — DC-only blocks, all-ones quantization)
        w, h = 40 + (i % 9) * 8, 24 + (i % 5) * 6
        color = ((i * 29) % 256, (i * 53) % 256, (i * 91) % 256)
        px = np.full((h, w, 3), color, dtype=np.uint8)
        rgbp = ycbcr_to_rgb(rgb_to_ycbcr(px[:1, :1]))[0, 0]
        golden = {
            "url": url,
            "media_type": "image/jpeg",
            "width": w,
            "height": h,
            "mean_r_milli": int(rgbp[0]) * 1000,
            "mean_g_milli": int(rgbp[1]) * 1000,
            "mean_b_milli": int(rgbp[2]) * 1000,
        }
        return {"url": url, "media": encode_jpeg(px)}, golden
    if kind == 5:
        # full 8-bit RGB PNG: dims + exact pixel means (like the BMP rows)
        w, h = 7 + (i % 6), 5 + (i % 4)
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                (xx * 13 + 5 * i) % 256,
                (yy * 3 + i) % 256,
                (xx * yy + 7 * i) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        golden = {
            "url": url,
            "media_type": "image/png",
            "width": w,
            "height": h,
            "mean_r_milli": int(px[:, :, 0].astype(np.int64).sum() * 1000 // (w * h)),
            "mean_g_milli": int(px[:, :, 1].astype(np.int64).sum() * 1000 // (w * h)),
            "mean_b_milli": int(px[:, :, 2].astype(np.int64).sum() * 1000 // (w * h)),
        }
        return {"url": url, "media": encode_png(px)}, golden
    if i % 2 == 0:
        w, h = 8 + (i % 5), 6 + (i % 3)
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                (xx * 7 + i) % 256,
                (yy * 11 + 2 * i) % 256,
                (xx + yy + 3 * i) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        golden = {
            "url": url,
            "media_type": "image/bmp",
            "width": w,
            "height": h,
            "mean_r_milli": int(px[:, :, 0].astype(np.int64).sum() * 1000 // (w * h)),
            "mean_g_milli": int(px[:, :, 1].astype(np.int64).sum() * 1000 // (w * h)),
            "mean_b_milli": int(px[:, :, 2].astype(np.int64).sum() * 1000 // (w * h)),
        }
        return {"url": url, "media": encode_bmp(px)}, golden
    n_samples = 200 + (i % 7) * 50
    t = np.arange(n_samples, dtype=np.int64)
    samples = (((t * (i + 3)) % 2000) - 1000).astype(np.int16)
    sq = samples.astype(np.int64)
    golden = {
        "url": url,
        "media_type": "audio/wav",
        "sample_rate": 8000,
        "n_samples": n_samples,
        "rms_milli": math.isqrt(int((sq * sq).sum()) * 1_000_000 // n_samples),
    }
    return {"url": url, "media": encode_wav(samples)}, golden


MEDIA_SCHEMA = "url string, media binary"


def media_df(spark, n: int, partitions: Optional[int] = None):
    """Distributed deterministic media corpus (url, media:binary)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [make_media(int(i))[0] for i in pdf["id"]],
                columns=["url", "media"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def expected_counts(n: int) -> dict[tuple, int]:
    """Golden per-(kind, lang) counts over the first n docs."""
    counts: dict[tuple, int] = {}
    for i in range(n):
        _, g = make_doc(i)
        if g is not None:
            key = (g["problem_kind"], g["lang"])
            counts[key] = counts.get(key, 0) + 1
    return counts


def make_image(i: int):
    """Deterministic BMP image row i for the perceptual-hash corpus.
    Images come in (base, variant) pairs: even i is a fresh pattern,
    odd i is a NEAR-DUPLICATE of i-1 — same pattern plus a small
    deterministic perturbation (a few +/-3 pixel nudges in one corner
    region and a uniform +1 brightness lift), the re-encode/brightness
    damage dHash is designed to see through. Pairs where
    (i//2) % 4 == 3 encode the VARIANT as PNG instead of BMP (both
    lossless → same-pixel hash parity), so near-dup pairs cross
    container formats — the real-crawl re-hosting case. Every 16th
    image (i%16 == 12) is NOT an image (an unknown blob) so the
    NULL-plumbing path stays exercised. Returns (row, dhash_golden)
    with the hash computed from the GENERATING array (lossless
    round-trip — by-construction golden, media_meta's convention)."""
    import numpy as np

    from .ops.multimodal import encode_bmp, encode_png, image_dhash

    url = f"img://{i:06d}"
    if i % 16 == 12:
        blob = b"\x89NOTBMP" + bytes([(i * 31 + j) % 256 for j in range(48)])
        return {"url": url, "media": blob}, None
    base = i - (i % 2)
    w = 24 + (base % 4) * 8
    h = 16 + (base % 3) * 8
    ph = (base * 17) % 251
    y, x = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, 3), dtype=np.int64)
    px[:, :, 0] = (x * 255) // max(w - 1, 1)
    px[:, :, 1] = (y * 255) // max(h - 1, 1)
    px[:, :, 2] = (x * (y + 3) + ph * 5) % 256
    # pattern family varies per base: stripe overlay
    px[:, :, 0] = (px[:, :, 0] + ((x + ph) % 7) * 11) % 256
    if i % 2 == 1:
        px = px + 1  # brightness lift (dHash-invariant by design)
        # a vertical smudge strong enough to flip a few gradient signs
        # (1-6 of 64 bits measured) but nowhere near re-pattern scale
        c = (w // 3) + (i % 5)
        px[:, c:c + 2, 0] += 25 + (i % 4) * 9
        r = h // 2
        px[r:r + 2, :, 1] += 17
    px = np.clip(px, 0, 255).astype(np.uint8)
    enc = encode_png if (i % 2 == 1 and (i // 2) % 4 == 3) else encode_bmp
    return {"url": url, "media": enc(px)}, image_dhash(px)


IMAGE_SCHEMA = "url string, media binary"
AUDIO_SCHEMA = IMAGE_SCHEMA  # same (url, blob) shape today; alias keeps them decoupled


def image_df(spark, n: int, partitions: Optional[int] = None):
    """Distributed deterministic image corpus (url, media:binary)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [make_image(int(i))[0] for i in pdf["id"]],
                columns=["url", "media"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=IMAGE_SCHEMA)


def make_audio(i: int):
    """Deterministic WAV clip row i for the audio-fingerprint corpus.
    Clips come in (base, variant) pairs: odd i is the SAME waveform as
    i-1 under an integer gain of 3 — frame energies scale by 9, every
    consecutive-energy delta keeps its sign, so the fingerprint is
    IDENTICAL by construction (the audio analog of dHash's brightness
    invariance). Every 16th row (i%16 == 5) is not a WAV. Returns
    (row, fingerprint_golden) with the golden computed from the
    generating samples (PCM is lossless)."""
    import numpy as np

    from .ops.multimodal import AUDIO_FRAME, audio_fingerprint, encode_wav

    url = f"wav://{i:06d}"
    if i % 16 == 5:
        return {"url": url, "media": b"\x1aNOTWAV" + bytes([(i * 29 + j) % 256 for j in range(40)])}, None
    base = i - (i % 2)
    n_frames = 72
    t = np.arange(n_frames * AUDIO_FRAME, dtype=np.int64)
    frame = t // AUDIO_FRAME
    amp = ((frame * 13 + (base * 7) % 97) % 50) + 1
    samples = ((t * 31 + base) % (2 * amp + 1)) - amp
    if i % 2 == 1:
        samples = samples * 3  # integer gain: fingerprint-invariant
    samples = samples.astype(np.int16)
    return {"url": url, "media": encode_wav(samples)}, audio_fingerprint(
        samples.astype(np.int64)
    )


def audio_df(spark, n: int, partitions: Optional[int] = None):
    """Distributed deterministic audio corpus (url, media:binary)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [make_audio(int(i))[0] for i in pdf["id"]],
                columns=["url", "media"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=AUDIO_SCHEMA)
