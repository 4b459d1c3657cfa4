"""Full-fidelity autoindex (directory-index HTML) parsing.

The reference lists HTTP staging sources by walking classic autoindex
pages — nginx, Apache ``pre``/fancy-table, NCBI style — because its
HTTP backend supports only stat/read (``blob/src/autoindex.rs:1-40``).
``aruna_spark.ops.staging.parse_autoindex_pages`` keeps a columnar
fast path for the repo's own generated dialect; THIS module is the
reference-exact parser the real-world fixtures exercise
(``blob/fixtures/autoindex_{nginx,apache_pre,apache_table}.html``):

- anchor scan with icon+name duplicate merge (rs:243-283): fancy
  indexes link an icon and the file name to the same target — merged
  into one entry, first-seen order, ``or``-filling size/modified;
- ``Index of`` / parent-link gate (rs:245-252): documents that do not
  look like a directory index parse to ``None`` rather than guesses;
- href resolution (rs:441-497): server-absolute hrefs resolve against
  the page's own base path and only DIRECT children survive; ``./``
  prefixes strip; scheme-carrying (``mailto:``), query, fragment,
  protocol-relative, traversal, and nested hrefs are not index rows;
  names percent-decode and reject separators/controls;
- trailing-cell parse (rs:516-616): the first date token (``YYYY-MM-DD``
  or ``DD-MMM-YYYY``), an optional ``HH:MM[:SS]`` time, then a size
  token — plain bytes or a ``K/M/G/T`` suffix at 1024 multiples, ``-``
  for directories; timestamps convert via the days-from-civil formula
  (no calendar dependency, rs:621-646).

A directory index page is bounded (the reference caps fetches at
16 MiB), so parsing is a per-row string kernel; the Spark face is an
Arrow-batched ``mapInPandas`` over ``(dir, html)`` pages — one parse
per page, partition-parallel across however many directories a
recursive walk queues.
"""

from __future__ import annotations

import re
import unicodedata

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        (
            "jan", "feb", "mar", "apr", "may", "jun",
            "jul", "aug", "sep", "oct", "nov", "dec",
        )
    )
}

_SIZE_MULTIPLIERS = {
    "k": 1024,
    "m": 1024**2,
    "g": 1024**3,
    "t": 1024**4,
}


def decode_entities(value: str) -> str:
    """The reference's bounded entity decoder (rs:380-439): the five
    named entities plus ``&nbsp;`` and numeric forms; unknown or
    unterminated entities pass through literally."""

    def repl(match: re.Match) -> str:
        entity = match.group(1)
        if entity in _ENTITIES:
            return _ENTITIES[entity]
        if entity.startswith(("#x", "#X")):
            try:
                return chr(int(entity[2:], 16))
            except (ValueError, OverflowError):
                return match.group(0)
        if entity.startswith("#"):
            try:
                return chr(int(entity[1:]))
            except (ValueError, OverflowError):
                return match.group(0)
        return match.group(0)

    # the reference scans at most 12 bytes for the terminating ';'
    return re.sub(r"&([^&;]{1,11});", repl, value)


def strip_tags(value: str) -> str:
    """Markup → text with each tag replaced by a space (rs:362-378)."""
    out = []
    in_tag = False
    for ch in value:
        if ch == "<":
            in_tag = True
        elif ch == ">" and in_tag:
            in_tag = False
            out.append(" ")
        elif not in_tag:
            out.append(ch)
    return "".join(out)


def _extract_href(tag: str) -> str | None:
    """``href`` attribute of one anchor tag, quoted or bare
    (rs:337-360): the attribute name must be preceded by whitespace
    (or start the scan window) and followed by ``=``."""
    lower = tag.lower()
    search = 0
    while True:
        found = lower.find("href", search)
        if found < 0:
            return None
        search = found + 4
        if found != 0 and not tag[found - 1].isspace():
            continue
        rest = tag[found + 4 :].lstrip()
        if not rest.startswith("="):
            continue
        rest = rest[1:].lstrip()
        if rest[:1] in ('"', "'"):
            quote = rest[0]
            end = rest.find(quote, 1)
            return rest[1:end] if end >= 0 else rest[1:]
        return re.split(r"\s", rest, maxsplit=1)[0]


def collect_anchors(html: str) -> list[dict]:
    """``<a␣…>`` anchors with text and the inter-anchor trailing cell
    (rs:295-335): text runs to ``</a``; trailing runs from the close
    of the anchor to the NEXT anchor start, tags stripped — that is
    where autoindex layouts put the date/size columns."""
    lower = html.lower()
    starts = [
        m.start()
        for m in re.finditer(r"<a", lower)
        if m.end() < len(html) and html[m.end()].isspace()
    ]
    anchors = []
    for index, start in enumerate(starts):
        tag_end = lower.find(">", start)
        if tag_end < 0:
            continue
        href = _extract_href(html[start:tag_end])
        if href is None:
            continue
        text_end = lower.find("</a", tag_end)
        if text_end < 0:
            continue
        text = strip_tags(html[tag_end + 1 : text_end])
        close = lower.find(">", text_end)
        close = close + 1 if close >= 0 else text_end
        nxt = starts[index + 1] if index + 1 < len(starts) else len(html)
        trailing = strip_tags(html[close:nxt]) if close < nxt else ""
        anchors.append(
            {
                "href": decode_entities(href.strip()),
                "text": decode_entities(text.strip()),
                "trailing": trailing,
            }
        )
    return anchors


def percent_decode(value: str) -> str | None:
    try:
        out = bytearray()
        data = value.encode()
        i = 0
        while i < len(data):
            if data[i : i + 1] == b"%":
                if len(data) < i + 3:
                    return None
                out.append(int(data[i + 1 : i + 3].decode(), 16))
                i += 3
            else:
                out.append(data[i])
                i += 1
        return out.decode()
    except (ValueError, UnicodeDecodeError):
        return None


def entry_from_anchor(base_path: str, anchor: dict) -> tuple[str, bool] | None:
    """(name, is_dir) for index rows; None for navigation/noise
    anchors (rs:441-497)."""
    text = anchor["text"].strip()
    if text.lower() == "parent directory" or text in ("..", "../"):
        return None
    href = anchor["href"]
    if not href or href.startswith(("#", "?")):
        return None
    if href.startswith("//") or "://" in href:
        return None
    if href.startswith("/"):
        if not href.startswith(base_path):
            return None
        relative = href[len(base_path) :]
    else:
        trimmed = href
        while trimmed.startswith("./"):
            trimmed = trimmed[2:]
        if ":" in trimmed.split("/", 1)[0]:
            return None
        relative = trimmed
    if not relative or "?" in relative or "#" in relative:
        return None
    is_dir = relative.endswith("/")
    segment = relative.rstrip("/")
    if not segment or "/" in segment:
        return None
    name = percent_decode(segment)
    if (
        name is None
        or not name
        or name in (".", "..")
        or "/" in name
        or "\\" in name
        or any(unicodedata.category(ch) == "Cc" for ch in name)
    ):
        return None
    return name, is_dir


def _parse_date_token(token: str) -> tuple[int, int, int] | None:
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", token):
        year, month, day = int(token[:4]), int(token[5:7]), int(token[8:10])
    elif re.fullmatch(r"\d{2}-[A-Za-z]{3}-\d{4}", token):
        month = _MONTHS.get(token[3:6].lower())
        if month is None:
            return None
        year, day = int(token[7:11]), int(token[:2])
    else:
        return None
    if 1970 <= year <= 9999 and 1 <= month <= 12 and 1 <= day <= 31:
        return year, month, day
    return None


def _parse_time_token(token: str) -> tuple[int, int, int] | None:
    match = re.fullmatch(r"(\d+):(\d+)(?::(\d+))?", token)
    if not match:
        return None
    hour, minute = int(match.group(1)), int(match.group(2))
    second = int(match.group(3)) if match.group(3) else 0
    if hour > 23 or minute > 59 or second > 59:
        return None
    return hour, minute, second


def parse_size_token(token: str) -> int | None:
    """Plain byte counts or 1024-multiple ``K/M/G/T`` suffixes; ``-``
    and anything else is no size (rs:597-619)."""
    if token == "-":
        return None
    if token.isascii() and token.isdigit():
        return int(token)
    if len(token) < 2:
        return None
    multiplier = _SIZE_MULTIPLIERS.get(token[-1].lower())
    if multiplier is None:
        return None
    try:
        value = float(token[:-1])
    except ValueError:
        return None
    if value != value or value in (float("inf"), float("-inf")) or value < 0:
        return None
    return int(value * multiplier)


def civil_to_epoch(
    year: int, month: int, day: int, hour: int, minute: int, second: int
) -> int | None:
    """Days-from-civil (Hinnant's formula, rs:621-646) — no calendar
    dependency; None for pre-epoch instants."""
    adjusted = year - 1 if month <= 2 else year
    era = adjusted // 400
    year_of_era = adjusted % 400
    month_prime = (month + 9) % 12
    day_of_year = (153 * month_prime + 2) // 5 + day - 1
    day_of_era = (
        year_of_era * 365 + year_of_era // 4 - year_of_era // 100 + day_of_year
    )
    days = era * 146_097 + day_of_era - 719_468
    seconds = days * 86_400 + hour * 3_600 + minute * 60 + second
    return seconds if seconds >= 0 else None


def parse_trailing(trailing: str) -> tuple[int | None, int | None]:
    """(size, modified_epoch) from the cell text after an anchor: the
    first date token anchors the scan; a time token may follow; the
    size token is whatever comes next (rs:516-544)."""
    tokens = trailing.split()
    for index, token in enumerate(tokens):
        date = _parse_date_token(token)
        if date is None:
            continue
        time = (
            _parse_time_token(tokens[index + 1])
            if index + 1 < len(tokens)
            else None
        )
        if time is not None:
            size_index = index + 2
        else:
            time = (0, 0, 0)
            size_index = index + 1
        size = (
            parse_size_token(tokens[size_index])
            if size_index < len(tokens)
            else None
        )
        return size, civil_to_epoch(*date, *time)
    return None, None


def normalized_base_path(base_path: str) -> str:
    normalized = base_path if base_path.startswith("/") else "/" + base_path
    return normalized if normalized.endswith("/") else normalized + "/"


def parse_autoindex(base_path: str, html: str) -> list[dict] | None:
    """One directory-index page → entry rows (name, is_dir, size,
    modified epoch seconds), or ``None`` when the document does not
    look like an index (rs:239-283)."""
    anchors = collect_anchors(html)
    is_index = "index of" in html.lower() or any(
        a["href"].strip() == "../"
        or a["text"].strip().lower() == "parent directory"
        for a in anchors
    )
    if not is_index:
        return None
    base = normalized_base_path(base_path)
    entries: list[dict] = []
    by_name: dict[str, int] = {}
    for anchor in anchors:
        resolved = entry_from_anchor(base, anchor)
        if resolved is None:
            continue
        name, is_dir = resolved
        size, modified = parse_trailing(anchor["trailing"])
        existing = by_name.get(name)
        if existing is not None:
            entry = entries[existing]
            entry["size"] = entry["size"] if entry["size"] is not None else size
            entry["modified"] = (
                entry["modified"] if entry["modified"] is not None else modified
            )
        else:
            by_name[name] = len(entries)
            entries.append(
                {
                    "name": name,
                    "is_dir": is_dir,
                    "size": size,
                    "modified": modified,
                }
            )
    return entries


AUTOINDEX_SCHEMA = (
    "dir string, name string, is_dir boolean, size long, modified long"
)


def autoindex_entries(pages):
    """Spark face: ``(dir, html)`` pages → exploded entry rows under
    ``AUTOINDEX_SCHEMA``. One bounded parse per page inside an Arrow
    batch; non-index pages contribute no rows (the reference surfaces
    those as a ListError at the fetch layer)."""
    import pandas as pd

    def run(batches):
        for batch in batches:
            out = []
            for dir_, html in zip(batch["dir"], batch["html"]):
                parsed = parse_autoindex(dir_ if dir_ else "/", html)
                if parsed is None:
                    continue
                for e in parsed:
                    out.append((dir_, e["name"], e["is_dir"], e["size"], e["modified"]))
            yield pd.DataFrame(
                out, columns=["dir", "name", "is_dir", "size", "modified"]
            )

    return pages.mapInPandas(run, AUTOINDEX_SCHEMA)
