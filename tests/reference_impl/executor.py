"""Pure-Python reference executor (SURVEY.md §5.2, §2.9).

A faithful, *deterministically serialized* re-implementation of the
reference scrapers' crawl semantics (visited-set dedup
scrape_shoprite.py:417-425, politeness sleeps :257 / scrape_pnp.py:46,
retry/backoff :387-394, robots + visit window scrape_pnp.py:53-63,
pagination discovery) over the same synthetic-web fixtures. Its outputs
are the golden traces the Spark engine must reproduce exactly:

- per-epoch fetch order ``(epoch, fetch_seq, url_canon, result)``
- the final URL-seen set
- per-fetch ``scheduled_offset_ms``

The serialization rules mirror the engine's total orders (SURVEY.md
§2.9): discovery seq by sorted url_canon; per-host selection by
(priority desc, seq asc); fetch order by (scheduled_offset_ms, host,
seq). ~200 lines of plain dict/list code — no Spark, no pandas in the
hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from retailer_scrapers_spark.functions.urls import canonicalize_py

MAX_ATTEMPTS = 3


@dataclass
class RefConfig:
    epochs: int = 10
    per_host_budget: int = 8
    epoch_budget_s: float = 17_100.0
    logical_now_s: int = 5 * 3600
    default_delay_s: float = 10.0
    # "continuous": per-host politeness wait carries across epochs
    # (back-to-back budget windows), mirroring CrawlConfig.politeness_mode
    politeness_mode: str = "epoch"


@dataclass
class FrontierRow:
    url: str
    url_canon: str
    host: str
    priority: float
    depth: int
    attempt: int
    discovered_epoch: int
    seq: int


@dataclass
class RefResult:
    trace: list[dict] = field(default_factory=list)  # epoch, fetch_seq, url_canon, host, result, scheduled_offset_ms, attempt
    events: list[dict] = field(default_factory=list)  # epoch, url_canon, result (denied/deferred/…)
    seen: set[str] = field(default_factory=set)
    frontier_left: int = 0


def _host_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[1]
    return rest.split("/", 1)[0].split(":", 1)[0]


def _path_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def _in_window(now_s: int, start: str | None, end: str | None) -> bool:
    if not start:
        return True

    def secs(hhmm: str) -> int:
        h, m = hhmm.split(":")
        return int(h) * 3600 + int(m) * 60

    return secs(start) <= now_s <= secs(end)


def discover(page: dict) -> list[tuple[str, float]]:
    """Mirror of parsers.discover_links over one fetched site row."""
    import json
    import re

    out: list[tuple[str, float]] = []
    kind, payload, host = page["payload_kind"], page["payload"], page["host"]
    if kind == "html":
        m = re.search(r'<a class="pagination__next" href="([^"]*)"', payload)
        if m and m.group(1):
            out.append((m.group(1), 1.0))
        out.append((f"https://{host}/api/populateProductsWithHeavyAttributes?page={page['page']}", 1.5))
    elif kind == "json_pnp":
        j = json.loads(payload)
        cur, tot = j["pagination"]["currentPage"], j["pagination"]["totalPages"]
        if cur + 1 < tot:
            out.append(
                (f"https://{host}/pnphybris/v2/pnp-spa/products/search?currentPage={cur + 1}&pageSize=72", 1.0)
            )
    elif kind == "json_wool":
        j = json.loads(payload)
        inner = j["contents"][0]["mainContent"][0]["contents"][0]
        if inner["lastRecNum"] < inner["totalNumRecs"]:
            out.append(
                (f"https://{host}/server/searchCategory?category={page['category']}&No={(page['page'] + 1) * 24}&Nrpp=24", 1.0)
            )
    return out


def run_reference(
    site_rows: list[dict],
    robots_rows: list[dict],
    seed_rows: list[dict],
    cfg: RefConfig | None = None,
) -> RefResult:
    cfg = cfg or RefConfig()
    site = {r["url_canon"]: r for r in site_rows}
    robots = {r["host"]: r for r in robots_rows}
    res = RefResult()

    frontier: list[FrontierRow] = []
    for i, s in enumerate(sorted(seed_rows, key=lambda r: canonicalize_py(r["url"]))):
        uc = canonicalize_py(s["url"])
        frontier.append(FrontierRow(s["url"], uc, _host_of(uc), s.get("priority") or 1.0, 0, 0, 0, i + 1))

    carry: dict[str, int] = {}  # continuous-mode per-host owed wait (ms)
    for epoch in range(cfg.epochs):
        if not frontier:
            break
        # R3 robots deny
        allowed: list[FrontierRow] = []
        for r in frontier:
            rb = robots.get(r.host)
            if rb and any(_path_of(r.url_canon).startswith(d) for d in (rb.get("disallow") or [])):
                res.events.append({"epoch": epoch, "url_canon": r.url_canon, "result": "denied_robots"})
            else:
                allowed.append(r)
        # R2 visit window
        in_window, deferred = [], []
        for r in allowed:
            rb = robots.get(r.host) or {}
            if _in_window(cfg.logical_now_s, rb.get("visit_start_utc"), rb.get("visit_end_utc")):
                in_window.append(r)
            else:
                deferred.append(r)
                res.events.append({"epoch": epoch, "url_canon": r.url_canon, "result": "outside_window"})
        # D6 seen dedup
        unseen = [r for r in in_window if r.url_canon not in res.seen]
        # R6 top-k per host by (priority desc, seq asc)
        by_host: dict[str, list[FrontierRow]] = {}
        for r in unseen:
            by_host.setdefault(r.host, []).append(r)
        selected: list[FrontierRow] = []
        backlog: list[FrontierRow] = []
        for host in by_host:
            rows = sorted(by_host[host], key=lambda r: (-r.priority, r.seq))
            selected += rows[: cfg.per_host_budget]
            backlog += rows[cfg.per_host_budget :]
        # R1 politeness schedule (simulated clock; n_salt = 1 at fixture
        # scale). Continuous mode: the host's first fetch starts at the
        # carry owed from the previous epoch (back-to-back windows).
        scheduled: list[tuple[FrontierRow, int]] = []
        overflow: list[FrontierRow] = []
        budget_ms = int(cfg.epoch_budget_s * 1000)
        sched_hosts: set[str] = set()
        for host in by_host:
            rows = sorted([r for r in selected if r.host == host], key=lambda r: (-r.priority, r.seq))
            rb = robots.get(host) or {}
            delay_ms = int((rb.get("crawl_delay_s") or cfg.default_delay_s) * 1000)
            base = carry.get(host, 0) if cfg.politeness_mode == "continuous" else 0
            host_last = None
            for k, r in enumerate(rows):
                off = base + k * delay_ms
                if off < budget_ms:
                    scheduled.append((r, off))
                    host_last = off
                else:
                    overflow.append(r)
                    res.events.append({"epoch": epoch, "url_canon": r.url_canon, "result": "deferred_budget"})
            if cfg.politeness_mode == "continuous" and rows:
                sched_hosts.add(host)
                carry[host] = max(0, host_last + delay_ms - budget_ms) if host_last is not None else max(
                    0, carry.get(host, 0) - budget_ms
                )
        if cfg.politeness_mode == "continuous":
            for host in list(carry):
                if host not in sched_hosts:
                    carry[host] = max(0, carry[host] - budget_ms)
                if carry[host] == 0:
                    del carry[host]
        # fetch in deterministic order (scheduled_offset_ms, host, seq)
        scheduled.sort(key=lambda t: (t[1], t[0].host, t[0].seq))
        retries: list[FrontierRow] = []
        newly_seen: set[str] = set()
        discovered: list[tuple[str, float]] = []
        for fetch_seq, (r, off) in enumerate(scheduled, start=1):
            page = site.get(r.url_canon)
            if page is None:
                status = 404
            elif page["status"] >= 500 and r.attempt == 0:
                status = page["status"]
            else:
                status = 200
            if status >= 500:
                if r.attempt + 1 < MAX_ATTEMPTS:
                    result = "retry"
                    retries.append(
                        FrontierRow(r.url, r.url_canon, r.host, r.priority - 2.0**(r.attempt + 1),
                                    r.depth, r.attempt + 1, r.discovered_epoch, r.seq)
                    )
                else:
                    result = "dropped"
                    newly_seen.add(r.url_canon)
            else:
                result = "ok"
                newly_seen.add(r.url_canon)
                if page is not None:
                    discovered += discover(page)
            res.trace.append(
                {"epoch": epoch, "fetch_seq": fetch_seq, "url_canon": r.url_canon, "host": r.host,
                 "result": result, "scheduled_offset_ms": off, "attempt": r.attempt}
            )
        res.seen |= newly_seen
        # frontier' = backlog ∪ deferred ∪ overflow ∪ retries ∪ fresh discoveries
        max_seq = max((r.seq for r in frontier), default=0)
        existing_canon = {r.url_canon for r in frontier}
        fresh: dict[str, tuple[str, float]] = {}
        for url, prio in discovered:
            uc = canonicalize_py(url)
            if uc not in res.seen and uc not in existing_canon and uc not in fresh:
                fresh[uc] = (url, prio)
        new_rows = [
            FrontierRow(url, uc, _host_of(uc), prio, epoch + 1, 0, epoch + 1, max_seq + i + 1)
            for i, (uc, (url, prio)) in enumerate(sorted(fresh.items()))
        ]
        nxt: dict[str, FrontierRow] = {}
        for r in backlog + deferred + overflow + retries + new_rows:
            nxt.setdefault(r.url_canon, r)
        frontier = list(nxt.values())

    res.frontier_left = len(frontier)
    return res
