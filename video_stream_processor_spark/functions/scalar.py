"""Reference-parity scalar derivations as Catalyst Column expressions.

Each function re-expresses one scalar derivation of the reference engine
(`/root/reference/video_processor.py`, cited per function) as a pure
``pyspark.sql.functions`` expression — JVM-side, whole-stage-codegen'd,
no Python UDFs. Behavioral quirks of the reference are preserved
deliberately (SURVEY §7 watch list), e.g. the extension extractor keeps
slashes when the last dot is in a directory name, and the language
matcher hits substrings like ``'tam'`` inside unrelated words.

``pyref.py`` holds the plain-Python behavioral spec these are
property-tested against.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword set for tag extraction — video_processor.py:223.
STOPWORDS: tuple[str, ...] = (
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of",
    "with", "by", "official", "video", "audio", "hd", "tamil", "song",
)

# Language indicator sets in priority order — video_processor.py:230-241.
# The reference iterates a dict (insertion order); `any()` over each set
# makes within-language order irrelevant, so this tuple IS deterministic
# reference behavior.
LANGUAGE_PRIORITY: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("tamil", ("tamil", "tamizh", "tam")),
    ("hindi", ("hindi", "hind")),
    ("english", ("english", "eng")),
    ("telugu", ("telugu", "tel")),
    ("malayalam", ("malayalam", "mal")),
    ("kannada", ("kannada", "kan")),
)

# ext → codec map — video_processor.py:197-205; default 'MP4A' (:217).
CODEC_MAP: dict[str, str] = {
    "m4a": "MP4A",
    "mp4": "MP4A",
    "mp3": "MP3",
    "aac": "AAC",
    "webm": "OPUS",
    "ogg": "OGG",
    "m3u8": "HLS",
}
# Every bitrate_map entry and its default are 128 (video_processor.py:207-217).
DEFAULT_BITRATE = 128


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_hls(url: Column | str) -> Column:
    """P5: 1 if '.m3u8' in url.lower() else 0 — video_processor.py:182-184,:275."""
    return F.when(F.lower(_c(url)).contains(".m3u8"), F.lit(1)).otherwise(F.lit(0))


def url_path(url: Column | str) -> Column:
    """urlparse(url).path for absolute URLs — the host-relative path with
    query and fragment stripped. (java parse_url returns NULL for
    non-absolute inputs where Python returns the raw string — engine
    inputs are absolute URLs; documented divergence.)"""
    return F.coalesce(F.parse_url(_c(url), F.lit("PATH")), F.lit(""))


def file_extension(url: Column | str) -> Column:
    """F3: extension = path.split('.')[-1].split('?')[0].lower(), '' when
    the path has no dot — video_processor.py:186-192. Quirk preserved:
    a dot in a directory ('/a.b/c') yields 'b/c'."""
    path = url_path(url)
    after_last_dot = F.element_at(F.split(path, "[.]"), -1)
    ext = F.lower(F.element_at(F.split(after_last_dot, "[?]"), 1))
    return F.when(path.contains("."), ext).otherwise(F.lit(""))


def codec(url: Column | str) -> Column:
    """F5: literal-map codec lookup with 'MP4A' default — video_processor.py:194-217."""
    items = [F.lit(x) for kv in CODEC_MAP.items() for x in kv]
    return F.coalesce(
        F.element_at(F.create_map(*items), file_extension(url)), F.lit("MP4A")
    )


def bitrate(url: Column | str) -> Column:  # noqa: ARG001 - parity signature
    """F5: bitrate lookup — every entry and the default are 128
    (video_processor.py:207-217), so this constant-folds."""
    return F.lit(DEFAULT_BITRATE)


def title_tags(title: Column | str) -> Column:
    """F6-F8: tokenize lowered title on word chars, drop stopwords and
    len≤2 tokens, keep first 6, comma-join — video_processor.py:219-224.
    Python's \\w is [\\p{L}\\p{N}_] (no combining marks, unlike Java's
    (?U)\\w) — spelled out so Java matches Python tokenization."""
    words = F.regexp_extract_all(F.lower(_c(title)), F.lit(r"[\p{L}\p{N}_]+"), 0)
    kept = F.filter(words, lambda w: (F.length(w) > 2) & ~w.isin(*STOPWORDS))
    return F.array_join(F.slice(kept, 1, 6), ",")


def _language_struct(title: Column | str) -> Column:
    t = F.lower(_c(title))
    result = F.struct(
        F.lit("Tamil").alias("language"), F.lit("TAMIL").alias("languagecode")
    )  # default — video_processor.py:243-244
    for lang, indicators in reversed(LANGUAGE_PRIORITY):
        cond = reduce(lambda a, b: a | b, [t.contains(i) for i in indicators])
        result = F.when(
            cond,
            F.struct(
                F.lit(lang.capitalize()).alias("language"),
                F.lit(lang.upper()[:5]).alias("languagecode"),
            ),
        ).otherwise(result)
    return result


def language(title: Column | str) -> Column:
    """F9: first language whose indicator substring-matches the lowered
    title wins; default Tamil — video_processor.py:226-244. Substring
    quirks preserved ('tam' in 'normal' → no; 'mal' in 'normal' → yes,
    but only if no earlier language matched first)."""
    return _language_struct(title)["language"]


def language_code(title: Column | str) -> Column:
    """F9/F12: language.upper()[:5] — video_processor.py:241."""
    return _language_struct(title)["languagecode"]


def safe_filename(title: Column | str, url: Column | str) -> Column:
    """F10: strip non [word/space/-] chars, collapse [-\\s]+ to '_',
    append url extension or '.m4a' — video_processor.py:246-251."""
    safe = F.regexp_replace(_c(title), r"(?U)[^\p{L}\p{N}_\s-]", "")
    safe = F.regexp_replace(safe, r"(?U)[-\s]+", "_")
    ext = file_extension(url)
    return F.when(ext == "", F.concat(safe, F.lit(".m4a"))).otherwise(
        F.concat(safe, F.lit("."), ext)
    )


def truncate80(col: Column | str) -> Column:
    """F11: the [:80] slice applied to name/tags/filename — video_processor.py:285,290,301."""
    return F.substring(_c(col), 1, 80)


def dual_timestamp(ts: Column | str) -> tuple[Column, Column]:
    """F2: the reference renders one UTC instant two ways
    (video_processor.py:32-37): strftime('%Y-%m-%dT%H:%M:%S') and
    isoformat()+'Z' (microseconds omitted when zero, as Python does).
    Takes a *parameter* timestamp column — never current_timestamp() —
    so oracle-checked plans stay deterministic (SURVEY §4.3)."""
    base = F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.date_format(_c(ts), "SSSSSS")
    iso = F.when(frac == "000000", F.concat(base, F.lit("Z"))).otherwise(
        F.concat(base, F.lit("."), frac, F.lit("Z"))
    )
    return base, iso


def deterministic_uuid(key: Column | str, role: str) -> Column:
    """F1 deterministic mode: uuid-shaped md5 of (key, role) replacing
    uuid4 (video_processor.py:24-30) when plans must replay identically
    (SURVEY §4.3). Same derivation is SQL-expressible for the oracle."""
    h = F.md5(F.concat_ws("\x1f", _c(key), F.lit(role)))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def classify_extract_error(err: Column | str) -> Column:
    """F14: substring-match error taxonomy — video_processor.py:116-128.
    Categories drive the retry/fallback decision: bot_detected → fallback
    chain (S5), the three *unavailable* kinds → drop, else → retry (S4)."""
    e = _c(err)
    return (
        F.when(e.contains("Sign in to confirm you're not a bot"), F.lit("bot_detected"))
        .when(e.contains("Video unavailable"), F.lit("unavailable"))
        .when(e.contains("Private video"), F.lit("private"))
        .when(e.contains("This video is not available"), F.lit("not_available"))
        .otherwise(F.lit("retryable"))
    )
