"""OBIS REST source (SURVEY.md §2.1 S1-S5, §4 R2/R3).

Driver-side fetcher with statistics-driven partition planning — the v1
design from SURVEY §4: the driver plans date-range batches from the
``/statistics/years`` endpoint (greedy cumulative-sum packing,
reference ``whalefinder/obis.py:166-203``), fetches each batch with a
retry/backoff session, and lands raw JSON in the partitioned raw zone
where Spark's partition pruning replaces the reference's
filename-range scan (validate.py:85-143).

The batch **planner** is a pure function (unit-testable, no network);
the fetcher degrades gracefully when the network is unavailable.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from pathlib import Path

OBIS_BASE_URL = "https://api.obis.org/v3"
DEFAULT_PAGE_SIZE = 10_000
RETRY_STATUSES = {429, 500, 502, 503, 504}
MAX_RETRIES = 5
BACKOFF_FACTOR = 1.0
REQUEST_SLEEP_SECONDS = 1.0


@dataclass(frozen=True)
class Batch:
    """One planned /occurrence request (date range inclusive)."""

    start: str
    end: str


def pad_date_format(start: str, end: str) -> tuple[str, str]:
    """F2 (obis.py:103-122): bare-year bounds padded to full dates."""
    import re

    if not re.match(r"\d{4}-\d{2}-\d{2}", start):
        start = start + "-01-01"
    if not re.match(r"\d{4}-\d{2}-\d{2}", end):
        end = end + "-12-31"
    return start, end


def plan_batches(
    records: list[dict],
    startdate: str | None,
    enddate: str | None,
    size: int = DEFAULT_PAGE_SIZE,
) -> tuple[list[Batch], str, str]:
    """S4: greedy year-range packing (reference obis.py:166-203).

    Packs consecutive years into requests whose cumulative record count
    stays <= ``size``; a single year exceeding ``size`` flushes the
    running batch and gets its own request; the tail batch flushes at
    the last record. Returns (batches, resolved_start, resolved_end) —
    missing bounds default to the first/last year in the statistics
    response (obis.py:95-98).
    """
    years = [(str(r["year"]), int(r["records"])) for r in records]
    num_records = sum(n for _, n in years)
    start_bound = startdate or (years[0][0] if years else None)
    end_bound = enddate or (years[-1][0] if years else None)
    if start_bound is None or end_bound is None:
        return [], "", ""

    if size >= num_records:
        return [Batch(start_bound, end_bound)], start_bound, end_bound

    batches: list[Batch] = []
    start = start_bound
    previous_year = ""
    current_size = 0

    for i, (year, year_records) in enumerate(years):
        start = year if not start else start

        if year_records > size:
            # flush the running batch, then the big year alone
            if start and previous_year:
                batches.append(Batch(start, previous_year))
            batches.append(Batch(year, year))
            current_size = 0
            start = ""
            previous_year = ""
            continue

        if current_size + year_records > size:
            batches.append(Batch(start, previous_year))
            current_size = 0
            start = year

        current_size += year_records
        previous_year = year

        if i == len(years) - 1:
            batches.append(Batch(start, end_bound))

    return batches, start_bound, end_bound


class ObisClient:
    """S1: retrying HTTP client (reference obis.py:17-47 —
    Retry(total=5, backoff_factor=1, status_forcelist=[429,5xx]) with a
    1 s pace between requests)."""

    def __init__(self, base_url: str = OBIS_BASE_URL, sleep: float = REQUEST_SLEEP_SECONDS):
        self.base_url = base_url
        self.sleep = sleep

    def get(self, endpoint: str, params: dict) -> dict:
        qs = urllib.parse.urlencode({k: v for k, v in params.items() if v})
        url = f"{self.base_url}{endpoint}?{qs}"
        last_err: Exception | None = None
        for attempt in range(MAX_RETRIES):
            try:
                time.sleep(self.sleep if attempt == 0 else BACKOFF_FACTOR * (2**attempt))
                with urllib.request.urlopen(url, timeout=60) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:  # pragma: no cover - network
                last_err = e
                if e.code not in RETRY_STATUSES:
                    raise
            except urllib.error.URLError as e:  # pragma: no cover - network
                raise ConnectionError(f"OBIS unreachable: {e}") from e
        raise ConnectionError(f"OBIS retries exhausted: {last_err}")


def fetch_statistics(
    client: ObisClient, scientificname: str, startdate: str | None, enddate: str | None
) -> list[dict]:
    """S2 (obis.py:78-101): per-year record counts."""
    return client.get(
        "/statistics/years",
        {"scientificname": scientificname, "startdate": startdate, "enddate": enddate},
    )


def fetch_occurrences_to_raw_zone(
    client: ObisClient,
    whale: str,
    scientificname: str,
    data_dir: str,
    startdate: str | None = None,
    enddate: str | None = None,
    size: int = DEFAULT_PAGE_SIZE,
) -> list[Path]:
    """S3/S5: fetch every planned batch and land raw JSON at
    ``{data_dir}/{whale}/{start}--{end}.json`` (obis.py:149-164)."""
    stats = fetch_statistics(client, scientificname, startdate, enddate)
    batches, _, _ = plan_batches(stats, startdate, enddate, size)
    out_dir = Path(data_dir) / whale
    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for b in batches:
        start, end = pad_date_format(b.start, b.end)
        payload = client.get(
            "/occurrence",
            {
                "scientificname": scientificname,
                "startdate": start,
                "enddate": end,
                "size": size,
            },
        )
        path = out_dir / f"{start}--{end}.json"
        path.write_text(json.dumps(payload, ensure_ascii=False, indent=4))
        written.append(path)
    return written
