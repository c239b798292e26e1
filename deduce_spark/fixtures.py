"""Deterministic synthetic `pages` table (FIXTURES.md §1).

Generates Common-Crawl-style rows (url, warc_ts, html, text, lang) with:
- zipf-skewed domains (a few hot domains — exercises salted repartition);
- Dutch-flavored body text carrying every PHI family the annotators detect
  (names with prefixes/interfixes, placenames, hospitals, streets +
  housenumbers, dates, ages, elfproef-valid/invalid BSNs, 7+ digit ids,
  NL phone numbers, emails, urls — mirroring the families in reference
  tests/pipeline/test_deduce.py:5-10);
- html wrapping with boilerplate tags, entities, comments and a <script>
  block the extractor must drop; ``extract_text(html) == text`` holds
  byte-identically per construction (asserted for a sample).

Everything is seeded (seed=42) and pure-function deterministic: page i's
content depends only on (seed, i).
"""

from __future__ import annotations

import html as html_mod
import random
from datetime import datetime, timedelta, timezone
from pathlib import Path

from deduce_spark.kernel.html_text import extract_text

SEED = 42

# pools drawn from the reference lookup lists (data); membership is
# asserted by tests/spark/test_fixtures.py so generated pages really
# exercise the dictionary annotators
FIRST_NAMES = [
    "Jan", "Peter", "Maria", "Johan", "Pieter", "Sophie", "Thomas", "Emma",
    "Willem", "Anna", "Hendrik", "Julia", "Karel", "Lisa", "Adriaan",
]
SURNAMES = [
    "Jansen", "Visser", "Bakker", "Meijer", "Mulder", "Bos", "Vos",
    "Peters", "Hendriks", "Dekker", "Smit", "Timmermans",
]
INTERFIXES = ["van", "de", "van der", "van den", "ter"]
PREFIXES = ["dr.", "dhr.", "mw.", "prof."]
PLACES = [
    "Utrecht", "Amsterdam", "Rotterdam", "Groningen", "Eindhoven",
    "Nijmegen", "Arnhem", "Leiden", "Delft", "Zwolle",
]
HOSPITALS = ["UMCU", "AMC", "VUMC", "LUMC", "Diakonessenhuis", "UMCG"]
STREET_SUFFIX = ["straat", "laan", "weg", "plein", "kade"]
MONTHS = [
    "januari", "februari", "maart", "april", "mei", "juni", "juli",
    "augustus", "september", "oktober", "november", "december",
]

DOMAINS = [f"site{i:03d}.nl" for i in range(100)]


def _zipf_domain(rng: random.Random) -> str:
    # rank ~ zipf(s≈1.1) over 100 domains: a few hot, long tail
    r = rng.random()
    rank = int(100 * (r ** 2.2))  # quadratic skew toward 0
    return DOMAINS[min(rank, 99)]


def _valid_bsn(rng: random.Random) -> str:
    while True:
        digits = [rng.randint(0, 9) for _ in range(8)]
        total = sum(d * w for d, w in zip(digits, (9, 8, 7, 6, 5, 4, 3, 2)))
        last = total % 11
        if last < 10:
            digits.append(last)
            return "".join(map(str, digits))


def _person(rng: random.Random) -> str:
    name = rng.choice(FIRST_NAMES)
    if rng.random() < 0.5:
        name += " " + rng.choice(INTERFIXES) + " " + rng.choice(SURNAMES)
    else:
        name += " " + rng.choice(SURNAMES)
    if rng.random() < 0.3:
        name = rng.choice(PREFIXES) + " " + name
    return name


def page_text(rng: random.Random) -> str:
    lines = []
    n_sent = rng.randint(3, 8)
    for _ in range(n_sent):
        kind = rng.randint(0, 9)
        if kind == 0:
            lines.append(
                f"Op {rng.randint(1, 28)} {rng.choice(MONTHS)} "
                f"{rng.randint(1999, 2024)} bezocht {_person(rng)} het "
                f"{rng.choice(HOSPITALS)} in {rng.choice(PLACES)}."
            )
        elif kind == 1:
            lines.append(
                f"De redactie sprak met {_person(rng)}, "
                f"{rng.randint(18, 95)} jaar oud, uit {rng.choice(PLACES)}."
            )
        elif kind == 2:
            bsn = _valid_bsn(rng) if rng.random() < 0.5 else str(
                rng.randint(100000000, 999999999)
            )
            lines.append(f"Dossier met bsn {bsn} en patnr {rng.randint(1000000, 99999999)}.")
        elif kind == 3:
            lines.append(
                f"Bel {rng.choice(['06', '030', '010', '020'])}"
                f"{'-' if rng.random() < 0.5 else ' '}"
                f"{rng.randint(1000000, 9999999)} voor meer informatie."
            )
        elif kind == 4:
            user = rng.choice(FIRST_NAMES).lower()
            lines.append(
                f"Mail naar {user}.{rng.choice(SURNAMES).lower()}"
                f"@voorbeeld.nl of kijk op www.site{rng.randint(0, 99):03d}.nl vandaag."
            )
        elif kind == 5:
            lines.append(
                f"Het kantoor zit aan de {rng.choice(SURNAMES)}"
                f"{rng.choice(STREET_SUFFIX)} {rng.randint(1, 200)} "
                f"in {rng.choice(PLACES)}."
            )
        elif kind == 6:
            lines.append(
                f"Geboren op {rng.randint(1, 28):02d}-"
                f"{rng.randint(1, 12):02d}-{rng.randint(1950, 2020)} "
                f"te {rng.choice(PLACES)}."
            )
        else:
            words = rng.sample(
                ["nieuws", "weer", "verkeer", "sport", "economie", "cultuur",
                 "politiek", "regio", "wetenschap", "techniek", "zorg",
                 "onderwijs", "energie", "wonen", "reizen", "media"],
                k=rng.randint(4, 8),
            )
            lines.append("Rubriek " + " en ".join(words) + " vandaag bijgewerkt.")
    return "\n".join(lines)


def page_html(text: str, url: str, rng: random.Random) -> bytes:
    """Wrap text lines in boilerplate HTML; extract_text() inverts exactly."""
    body = "\n".join(
        f"  <p>{html_mod.escape(line)}</p>" for line in text.split("\n")
    )
    doc = (
        "<html><head><meta charset=\"utf-8\">"
        f"<script>var u = \"{url}\"; trackVisit(u);</script>"
        "<style>p { margin: 0; }</style>"
        "</head>\n"
        f"<body>\n<!-- generated page {url} -->\n<div>\n{body}\n</div>\n"
        "<footer></footer></body></html>"
    )
    return doc.encode("utf-8")


def generate_pages(n_pages: int, seed: int = SEED) -> dict[str, list]:
    """Columnar dict of n_pages deterministic rows."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    domain_seq: dict[str, int] = {}
    for i in range(n_pages):
        rng = random.Random((seed << 20) ^ i)
        domain = _zipf_domain(rng)
        k = domain_seq.get(domain, 0)
        domain_seq[domain] = k + 1
        url = f"https://{domain}/artikel/{i:08d}"
        text = page_text(rng)
        lang = "nl" if rng.random() < 0.9 else rng.choice(["en", "de"])
        urls.append(url)
        # monotone within domain: index within domain spaces the timestamps
        tss.append(base_ts + timedelta(minutes=7 * k, seconds=i % 60))
        htmls.append(page_html(text, url, rng))
        texts.append(text)
        langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


def write_pages_parquet(
    out_dir: Path, n_pages: int, seed: int = SEED, pages_per_file: int = 768
) -> Path:
    """Write the pages table as a DIRECTORY of parquet part files; cached by
    (n_pages, seed).

    Multiple files matter even at toy scale: a single file makes the first
    Spark scan (and any downstream shuffle write) one serial task — the
    Amdahl bottleneck that capped 8→32-core scaling in early benchmarks.  A
    real Common-Crawl dump is thousands of WARC-derived files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = Path(out_dir)
    out_path = out_dir / f"pages_n{n_pages}_s{seed}"
    if (out_path / "_SUCCESS").exists():
        return out_path
    cols = generate_pages(n_pages, seed)
    # invariant spot-check: extraction inverts the wrapping
    for j in range(0, n_pages, max(1, n_pages // 50)):
        assert extract_text(cols["html"][j]) == cols["text"][j]
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us", tz="UTC")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )
    out_path.mkdir(parents=True, exist_ok=True)
    n_files = max(1, (n_pages + pages_per_file - 1) // pages_per_file)
    for i in range(n_files):
        chunk = table.slice(i * pages_per_file, pages_per_file)
        pq.write_table(chunk, out_path / f"part-{i:05d}.parquet",
                       row_group_size=pages_per_file)
    (out_path / "_SUCCESS").touch()
    return out_path
