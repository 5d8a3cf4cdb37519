"""U1 — the per-URL enrichment source, the reference's single biggest
component (extract_video_info, /root/reference/video_processor.py:39-180,
34% of the file).

Architecture: enrichment is a *batch* interface (`Extractor.extract`
over a pandas Series of URLs) so it rides ``mapInPandas`` — Arrow
batches in/out, connection reuse and throttling amortized per batch,
never per row. Dependency-injected so the network-bound yt-dlp adapter
stays out of every test and CI path (SURVEY §5.2, §7 watch list); tests
use the deterministic ``StubExtractor``.

Failure contract (mirrors the reference): a failed URL yields an
all-null info row (video_processor.py:81,122,125,128,136,180 return
``None``); the pipeline's P2 filter drops and counts them.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator
from typing import Protocol

import pandas as pd

INFO_COLUMNS = (
    "title",
    "description",
    "thumbnail",
    "stream_url",
    "duration",
    "uploader",
    "view_count",
)


class Extractor(Protocol):
    def extract(self, urls: pd.Series) -> pd.DataFrame:
        """Return one row per url with INFO_COLUMNS; all-null row = failure."""
        ...


# ---------------------------------------------------------------------------
# Deterministic stub (the test-path extractor; FIXTURES.md §A2)
# ---------------------------------------------------------------------------

_TITLE_WORDS = (
    "chellame", "rhymes", "kids", "super", "hit", "melody", "classic",
    "dance", "paattu", "story", "tamil", "hindi", "english", "telugu",
    "malayalam", "kannada", "song", "official", "video", "hd",
)
_EXTS = ("m4a", "mp3", "m3u8", "webm", "ogg", "aac")


class StubExtractor:
    """Pure function of the URL (md5-seeded) with the reference's three
    outcome classes: ~1/16 hard failures (null row, P2 path), ~1/16
    unresolved YouTube URLs (P3 path), rest valid audio streams."""

    def __init__(self, fail_mod: int = 16):
        self.fail_mod = fail_mod

    def _one(self, url: str) -> dict | None:
        h = hashlib.md5(url.encode("utf-8")).hexdigest()
        b0 = int(h[:2], 16)
        if b0 % self.fail_mod == 0:
            return None  # extraction failure
        words = [_TITLE_WORDS[int(h[i : i + 2], 16) % len(_TITLE_WORDS)] for i in (2, 4, 6, 8)]
        title = " ".join(words).title()
        if b0 % self.fail_mod == 1:
            stream_url = f"https://www.youtube.com/watch?v={h[8:19]}"  # unresolved (P3)
        else:
            ext = _EXTS[int(h[2:4], 16) % len(_EXTS)]
            stream_url = (
                f"https://cdn{int(h[4:6], 16) % 4}.example.com/audio/{h[6:14]}.{ext}"
                f"?expire={int(h[14:18], 16)}"
            )
        return {
            "title": title,
            "description": f"Description of {title}",
            "thumbnail": f"https://i.example.com/{h[18:26]}/default.jpg",
            "stream_url": stream_url,
            "duration": int(h[26:30], 16),
            "uploader": f"Uploader {int(h[30:32], 16) % 50}",
            "view_count": int(h[:8], 16),
        }

    def extract(self, urls: pd.Series) -> pd.DataFrame:
        rows = []
        for url in urls:
            info = self._one(url)
            rows.append(info if info is not None else dict.fromkeys(INFO_COLUMNS))
        out = pd.DataFrame(rows, columns=list(INFO_COLUMNS))
        out["duration"] = out["duration"].astype("Int64")
        out["view_count"] = out["view_count"].astype("Int64")
        return out


# ---------------------------------------------------------------------------
# Real adapter (NOT imported by tests; requires yt-dlp + network)
# ---------------------------------------------------------------------------


class YtDlpExtractor:
    """Network adapter with the reference's resilience semantics:
    2 attempts with 5s·(attempt+1) backoff (video_processor.py:41-44,
    130-136), error-string taxonomy routing (:116-128 — bot detection →
    fallback chain, unavailable/private → fail fast), fallback chain =
    flat extraction then alternate client (:138-180), bandwidth cap and
    politeness delay (:58-59,:377-381) as a per-batch token budget.

    Instantiated lazily on executors inside mapInPandas batches — one
    client per batch, not per row.
    """

    def __init__(
        self,
        max_retries: int = 2,
        retry_delay_s: float = 5.0,
        per_record_delay_s: float = 0.0,
        rate_limit_bps: int = 1_024_000,
    ):
        import yt_dlp  # gated: only the real pipeline path imports this

        self._yt_dlp = yt_dlp
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s
        self.per_record_delay_s = per_record_delay_s
        self.rate_limit_bps = rate_limit_bps

    def _info_to_row(self, info: dict, fallback_url: str) -> dict:
        stream_url = info.get("url")
        if stream_url is None:
            formats = info.get("formats") or []
            audio = [
                f for f in formats
                if f.get("vcodec") == "none" and f.get("acodec") != "none"
            ]
            preferred = [
                f for f in audio
                if any(c in (f.get("acodec") or "") for c in ("mp4a", "aac", "mp3"))
            ]
            pick = (preferred or audio or formats)
            stream_url = pick[-1]["url"] if pick else fallback_url
        return {
            "title": info.get("title", "Unknown Title"),
            "description": info.get("description", ""),
            "thumbnail": info.get("thumbnail", ""),
            "stream_url": stream_url,
            "duration": info.get("duration", 0),
            "uploader": info.get("uploader", ""),
            "view_count": info.get("view_count", 0),
        }

    def _extract_one(self, url: str) -> dict | None:
        opts = {
            "quiet": True,
            "noplaylist": True,
            "socket_timeout": 60,
            "ratelimit": self.rate_limit_bps,
            "throttled_rate": self.rate_limit_bps,
        }
        for attempt in range(self.max_retries):
            try:
                with self._yt_dlp.YoutubeDL(opts) as ydl:
                    info = ydl.extract_info(url, download=False)
                if not info:
                    return None
                return self._info_to_row(info, url)
            except Exception as exc:  # error taxonomy, reference :116-128
                msg = str(exc)
                if "Sign in to confirm you're not a bot" in msg:
                    return self._extract_fallback(url)
                if any(
                    s in msg
                    for s in ("Video unavailable", "Private video", "This video is not available")
                ):
                    return None
                if attempt < self.max_retries - 1:
                    time.sleep(self.retry_delay_s * (attempt + 1))
        return None

    def _extract_fallback(self, url: str) -> dict | None:
        """Fallback chain: flat extraction, then alternate player client."""
        try:
            with self._yt_dlp.YoutubeDL({"quiet": True, "extract_flat": True}) as ydl:
                info = ydl.extract_info(url, download=False)
            if info and "url" not in info:
                alt = {
                    "quiet": True,
                    "extractor_args": {"youtube": {"player_client": ["ios"]}},
                }
                with self._yt_dlp.YoutubeDL(alt) as ydl:
                    full = ydl.extract_info(url, download=False)
                if full and "url" in full:
                    info = full
            if info:
                row = self._info_to_row(info, url)
                row["stream_url"] = info.get("url", url)
                return row
        except Exception:
            pass
        return None

    def extract(self, urls: pd.Series) -> pd.DataFrame:
        rows = []
        for url in urls:
            info = self._extract_one(url)
            rows.append(info if info is not None else dict.fromkeys(INFO_COLUMNS))
            if self.per_record_delay_s:
                time.sleep(self.per_record_delay_s)
        return pd.DataFrame(rows, columns=list(INFO_COLUMNS))


def make_enrich_fn(
    extractor_factory: Callable[[], Extractor],
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas body: instantiate the extractor once per
    partition (executor-side), enrich each Arrow batch of URLs.

    Takes a *factory* so the extractor is constructed on executors —
    no pickled network clients, no driver-captured state.
    """

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = extractor_factory()
        for pdf in batches:
            info = extractor.extract(pdf["url"])
            info.index = pdf.index
            yield pd.concat([pdf, info], axis=1)

    return enrich
