"""Deterministic synthetic web generator (FIXTURES.md; SURVEY.md §7 phase 0).

Four hosts mirror the reference retailers' page geometries and payload
shapes (seed=42, pure functions of (host, page, pos) — the golden-trace
reference executor regenerates identical content):

- ``shoprite.test`` / ``checkers.test`` — HTML pages, 20 items/page
  (scrape_shoprite.py:303), ``.item-product`` blocks with
  ``item-product__name`` / ``.before`` / ``.now`` / decoy
  ``discovery-vitality`` images (scrape_shoprite.py:259-278), a hidden
  ``.productListJSON`` node (scrape_shoprite.py:249-250), plus a
  second-stage heavy-attrs JSON URL per page (scrape_shoprite.py:345-352).
- ``pnp.test`` — JSON pages, 72 items/page (scrape_pnp.py:121), nested
  ``price.formattedValue`` / carousel images / promotions
  (scrape_pnp.py:168-183).
- ``woolworths.test`` — JSON pages, 24 items/page per category
  (scrape_woolworths.py:71), deep
  ``contents[0].mainContent[0].contents[0].records`` nesting with
  ``attributes`` maps (scrape_woolworths.py:116-138), a sentinel row
  (scrape_woolworths.py:140-142) and a one-shot offer page
  (scrape_woolworths.py:153-227).

Seeded 5xx statuses exercise retry/backoff (scrape_shoprite.py:387-394).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from retailer_scrapers_spark.functions.images import encode_image, phash64

HOSTS = ("shoprite.test", "checkers.test", "pnp.test", "woolworths.test")
RETAILER_OF_HOST = {
    "shoprite.test": "Shoprite",
    "checkers.test": "Checkers",
    "pnp.test": "Pick n Pay",
    "woolworths.test": "Woolworths",
}
ITEMS_PER_PAGE = {"shoprite.test": 20, "checkers.test": 20, "pnp.test": 72, "woolworths.test": 24}
# O2 base offsets (scrape_checkers.py:596, scrape_pnp.py:367,
# scrape_shoprite.py:591, scrape_woolworths.py:396)
BASE_OFFSETS = {"Checkers": 0, "Pick n Pay": 7500, "Shoprite": 17500, "Woolworths": 29000}
WOOL_CATEGORIES = ("food", "drinks", "household")  # 18 in the reference; 3 at test scale
SENTINEL_NAME = "FFF_Water_Content_Card_Wk43"  # scrape_woolworths.py:141
DECOY_IMG = "https://cdn.test/discovery-vitality/banner.png"  # scrape_shoprite.py:276
OFFER_SENTENCE = "Offer valid 4 August - 17 August 2025"

_UNICODE_BITS = ("", " Café", " Crème", " Rooïbos", "", "")


@dataclass
class SiteSpec:
    """Geometry knobs (scaled down from the reference's 376/138/… pages)."""

    pages: dict[str, int] = field(
        default_factory=lambda: {"shoprite.test": 6, "checkers.test": 6, "pnp.test": 4}
    )
    wool_pages_per_category: int = 2
    categories: tuple[str, ...] = WOOL_CATEGORIES
    error_every: int = 17  # every k-th page URL gets a seeded 503 on first attempt


def stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def product_at(host: str, page: int, pos: int, category: str | None = None) -> dict:
    """THE content oracle: every payload renderer and the golden
    reference executor derive product fields from this pure function."""
    cat = f"{category}_" if category else ""
    rid = f"{host.split('.')[0]}_{cat}{page:04d}_{pos:02d}"
    h = stable_hash(rid)
    # deliberate cross-page duplicate names every 10th product (exercises D1/D3)
    if pos % 10 == 9 and page > 0:
        return product_at(host, page - 1, pos, category) | {"image_id": rid, "dup_of_prev_page": True}
    price = 5.0 + (h % 19500) / 100.0
    on_promo = h % 3 == 0
    promo_price = round(price * 0.8, 2)
    name = f"Product {rid}{_UNICODE_BITS[h % len(_UNICODE_BITS)]}"
    missing_image = h % 11 == 7
    has_decoy = h % 5 == 0
    return {
        "image_id": rid,
        "name": name,
        "price": f"R{price:.2f}",
        "price_old": f"R{price:.2f}" if on_promo else "",
        "price_now": f"R{promo_price:.2f}" if on_promo else f"R{price:.2f}",
        "on_promo": on_promo,
        "sale_price": promo_price if on_promo else None,
        "valid_text": "Valid until 7 August 2025" if on_promo else "",
        "missing_image": missing_image,
        "has_decoy": has_decoy,
        "dup_of_prev_page": False,
    }


def image_url_of(host: str, image_id: str) -> str:
    return f"https://{host}/img/{image_id}.png"


# ---------------------------------------------------------------------------
# Payload renderers
# ---------------------------------------------------------------------------

def render_html_page(host: str, page: int, n_pages: int) -> str:
    items, pl_json = [], []
    for pos in range(ITEMS_PER_PAGE[host]):
        p = product_at(host, page, pos)
        imgs = ""
        if p["has_decoy"]:
            imgs += f'<img data-original-src="{DECOY_IMG}"/>'
        if not p["missing_image"]:
            # relative URL half the time → exercises F6 prefix fix
            u = image_url_of(host, p["image_id"])
            if stable_hash(p["image_id"] + "rel") % 2 == 0:
                u = u.replace(f"https://{host}", "")
            imgs += f'<img data-original-src="{u}"/>'
        items.append(
            '<div class="item-product">'
            f'<h3 class="item-product__name">{p["name"]}</h3>'
            f'<span class="before">{p["price_old"]}</span>'
            f'<span class="now">{p["price_now"]}</span>'
            f"{imgs}</div>"
        )
        pl_json.append({"sku": p["image_id"], "name": p["name"]})
    nxt = (
        f'<a class="pagination__next" href="https://{host}/c-2256/All-Departments?q=%3Arelevance&page={page + 1}"></a>'
        if page + 1 < n_pages
        else ""
    )
    hidden = f'<div class="productListJSON" style="display:none">{json.dumps({"products": pl_json})}</div>'
    return f"<html><body>{''.join(items)}{hidden}{nxt}</body></html>"


def render_heavy_attrs(host: str, page: int) -> str:
    out = []
    for pos in range(ITEMS_PER_PAGE[host]):
        p = product_at(host, page, pos)
        h = stable_hash(p["image_id"] + "promo")
        entry: dict = {"sku": p["image_id"], "salePrice": None, "includedInBonusBuys": [], "htmlBBs": ""}
        if p["on_promo"]:
            if h % 2 == 0:
                entry["salePrice"] = p["sale_price"]
            else:
                entry["includedInBonusBuys"] = [{"name": f"Buy 2 save R{h % 20}"}]
            entry["htmlBBs"] = (
                f'&lt;div&gt;<span class="item-product__valid">{p["valid_text"].replace(" ", " ")}</span>'
            )
        out.append(entry)
    return json.dumps({"items": out})


def render_pnp_page(host: str, page: int, n_pages: int) -> str:
    prods = []
    for pos in range(ITEMS_PER_PAGE[host]):
        p = product_at(host, page, pos)
        images = [{"format": "thumbnail", "url": DECOY_IMG}]
        if not p["missing_image"]:
            images.append({"format": "carousel", "url": image_url_of(host, p["image_id"])})
        promotions = (
            [{"promotionTextMessage": f"Save on {p['name']}", "endDate": "2025-08-07T21:59:59+00:00"}]
            if p["on_promo"]
            else []
        )
        prods.append(
            {
                "code": p["image_id"],
                "name": p["name"],
                "price": {"formattedValue": p["price"]},
                "images": images,
                "potentialPromotions": promotions,
            }
        )
    body = {
        "products": prods,
        "pagination": {"currentPage": page, "totalPages": n_pages},
    }
    return json.dumps(body)


def render_wool_page(host: str, category: str, page: int, n_pages: int, total_recs: int) -> str:
    records = []
    for pos in range(ITEMS_PER_PAGE[host]):
        p = product_at(host, page, pos, category)
        name = SENTINEL_NAME if (page == 0 and pos == 5) else p["name"]
        records.append(
            {
                "attributes": {
                    "p_displayName": name,
                    "p_imageReference": "" if p["missing_image"] else image_url_of(host, p["image_id"]),
                    "sku": p["image_id"],
                },
                "startingPrice": {"p_pl10": float(p["price"][1:])},
            }
        )
    body = {
        "contents": [
            {
                "mainContent": [
                    {
                        "contents": [
                            {
                                "records": records,
                                "totalNumRecs": total_recs,
                                "lastRecNum": (page + 1) * ITEMS_PER_PAGE[host],
                            }
                        ]
                    }
                ]
            }
        ]
    }
    return json.dumps(body)


def render_offer_page() -> str:
    return json.dumps(
        {"contents": [{"content": "Daily Difference specials. " + OFFER_SENTENCE + ". Terms apply."}]}
    )


# ---------------------------------------------------------------------------
# Table builders (pandas; callers createDataFrame with schemas.*)
# ---------------------------------------------------------------------------

def page_url(host: str, page: int, category: str | None = None) -> str:
    if host in ("shoprite.test", "checkers.test"):
        return f"https://{host}/c-2256/All-Departments?q=%3Arelevance&page={page}"
    if host == "pnp.test":
        return f"https://{host}/pnphybris/v2/pnp-spa/products/search?currentPage={page}&pageSize=72"
    return f"https://{host}/server/searchCategory?category={category}&No={page * 24}&Nrpp=24"


def heavy_url(host: str, page: int) -> str:
    return f"https://{host}/api/populateProductsWithHeavyAttributes?page={page}"


def offer_url() -> str:
    return "https://woolworths.test/cat/DailyDifference"


def build_site_pages(spec: SiteSpec | None = None) -> pd.DataFrame:
    spec = spec or SiteSpec()
    rows: list[dict] = []

    def add(url: str, host: str, page: int, category: str | None, kind: str, payload: str):
        from retailer_scrapers_spark.functions.urls import canonicalize_py

        # the table is keyed by CANONICAL url (sorted query keys etc.) —
        # fetch resolves frontier.url_canon against it
        url = canonicalize_py(url)
        # seeded 5xx on a deterministic subset (retry path, R4)
        status = 503 if stable_hash(url) % spec.error_every == 3 else 200
        rows.append(
            {
                "url_canon": url,
                "host": host,
                "page": page,
                "category": category,
                "payload_kind": kind,
                "payload": payload,
                "status": status,
            }
        )

    for host in ("shoprite.test", "checkers.test"):
        n = spec.pages[host]
        for pg in range(n):
            add(page_url(host, pg), host, pg, None, "html", render_html_page(host, pg, n))
            add(heavy_url(host, pg), host, pg, None, "json_heavy_attrs", render_heavy_attrs(host, pg))
    n = spec.pages["pnp.test"]
    for pg in range(n):
        add(page_url("pnp.test", pg), "pnp.test", pg, None, "json_pnp", render_pnp_page("pnp.test", pg, n))
    npg = spec.wool_pages_per_category
    total = npg * ITEMS_PER_PAGE["woolworths.test"]
    for cat in spec.categories:
        for pg in range(npg):
            add(
                page_url("woolworths.test", pg, cat),
                "woolworths.test",
                pg,
                cat,
                "json_wool",
                render_wool_page("woolworths.test", cat, pg, npg, total),
            )
    add(offer_url(), "woolworths.test", 0, None, "json_offer", render_offer_page())
    return pd.DataFrame(rows)


def corpus_image_ids(spec: SiteSpec | None = None) -> list[tuple[str, str]]:
    """(image_id, caption) for every product slot on the synthetic web."""
    spec = spec or SiteSpec()
    out: list[tuple[str, str]] = []
    for host in ("shoprite.test", "checkers.test", "pnp.test"):
        for pg in range(spec.pages[host]):
            for pos in range(ITEMS_PER_PAGE[host]):
                p = product_at(host, pg, pos)
                out.append((p["image_id"], p["name"]))
    for cat in spec.categories:
        for pg in range(spec.wool_pages_per_category):
            for pos in range(ITEMS_PER_PAGE["woolworths.test"]):
                p = product_at("woolworths.test", pg, pos, cat)
                out.append((p["image_id"], p["name"]))
    return out


_FMTS = ("png", "raw", "qjpg")


def make_image(image_id: str) -> tuple[bytes, int, int, str, int]:
    """Deterministic image for an id → (bytes, w, h, fmt, phash)."""
    h64 = stable_hash(image_id)
    w = 16 + h64 % 17
    ht = 16 + (h64 >> 8) % 17
    fmt = _FMTS[h64 % 3]
    rng = np.random.default_rng(h64 % (2**32))
    arr = rng.integers(0, 256, (ht, w), dtype=np.uint8)
    blob = encode_image(arr, fmt)
    from retailer_scrapers_spark.functions.images import decode_image

    ph = phash64(decode_image(blob, fmt))
    return blob, w, ht, fmt, ph


def build_corpus(spec: SiteSpec | None = None) -> pd.DataFrame:
    rows = []
    for image_id, caption in corpus_image_ids(spec):
        blob, w, h, fmt, ph = make_image(image_id)
        rows.append(
            {"image_id": image_id, "bytes": blob, "w": w, "h": h, "fmt": fmt, "caption": caption, "phash": ph}
        )
    return pd.DataFrame(rows).drop_duplicates("image_id").reset_index(drop=True)


def build_seeds(spec: "SiteSpec | None" = None) -> pd.DataFrame:
    """Raw (messy) seed URLs: mixed-case hosts, fragments, tracking params,
    unsorted query keys — exercises F8 canonicalization. Woolworths gets
    one seed per category of ``spec`` (default: the 3 test-scale ones)."""
    categories = spec.categories if spec is not None else WOOL_CATEGORIES
    return pd.DataFrame(
        [
            {
                "url": "https://SHOPRITE.test/c-2256/All-Departments?utm_source=mail&q=%3Arelevance&page=0#top",
                "host": "shoprite.test",
                "retailer": "Shoprite",
                "priority": 1.0,
            },
            {
                "url": "https://Checkers.TEST:443/c-2256/All-Departments?q=%3Arelevance&page=0&fbclid=xyz",
                "host": "checkers.test",
                "retailer": "Checkers",
                "priority": 1.0,
            },
            {
                "url": "https://pnp.test/pnphybris/v2/pnp-spa/products/search?pageSize=72&currentPage=0",
                "host": "pnp.test",
                "retailer": "Pick n Pay",
                "priority": 1.0,
            },
            *[
                {
                    "url": f"https://woolworths.test/server/searchCategory?Nrpp=24&category={cat}&No=0&utm_campaign=x",
                    "host": "woolworths.test",
                    "retailer": "Woolworths",
                    "priority": 1.0,
                }
                for cat in categories
            ],
            {
                "url": "https://woolworths.test/cat/DailyDifference",
                "host": "woolworths.test",
                "retailer": "Woolworths",
                "priority": 2.0,
            },
        ]
    )


def build_robots() -> pd.DataFrame:
    """README.md:61-67 + scrape_pnp.py:46,53-63: 10 s delay (one 5 s host
    for per-host variation), 04:00–08:45 UTC window, disallow prefixes."""
    return pd.DataFrame(
        [
            {"host": "shoprite.test", "crawl_delay_s": 5.0, "visit_start_utc": None, "visit_end_utc": None,
             "disallow": ["/checkout", "/login"], "user_agent": "CustomBot/1.0"},
            {"host": "checkers.test", "crawl_delay_s": 5.0, "visit_start_utc": None, "visit_end_utc": None,
             "disallow": ["/checkout", "/login"], "user_agent": "CustomBot/1.0"},
            {"host": "pnp.test", "crawl_delay_s": 10.0, "visit_start_utc": "04:00", "visit_end_utc": "08:45",
             "disallow": ["/pnphybris/v2/pnp-spa/users"], "user_agent": "CustomBot/1.0"},
            {"host": "woolworths.test", "crawl_delay_s": 10.0, "visit_start_utc": None, "visit_end_utc": None,
             "disallow": ["/server/cart"], "user_agent": "CustomBot/1.0"},
        ]
    )


def build_existing_products() -> pd.DataFrame:
    """Prior-run rows: some names collide with the synthetic web
    (skip-refetch F5), one placeholder-URL row, duplicate (name, price)
    pairs with differing promos (D1) and duplicate indexes (D2)."""
    from retailer_scrapers_spark.operators.joins import PLACEHOLDER_IMAGE_URL

    p0 = product_at("shoprite.test", 0, 0)
    p1 = product_at("shoprite.test", 0, 1)
    return pd.DataFrame(
        [
            {"index": 17500, "name": p0["name"], "price": p0["price"], "promotion_price": "No promo",
             "retailer": "Shoprite", "image_url": image_url_of("shoprite.test", p0["image_id"]),
             "promotion_valid": " "},
            {"index": 17501, "name": p1["name"], "price": p1["price"], "promotion_price": "No promo",
             "retailer": "Shoprite", "image_url": PLACEHOLDER_IMAGE_URL, "promotion_valid": " "},
            # duplicate (name, price) with promo — D1 must prefer this row
            {"index": 17502, "name": p0["name"], "price": p0["price"], "promotion_price": "R9.99",
             "retailer": "Shoprite", "image_url": image_url_of("shoprite.test", p0["image_id"]),
             "promotion_valid": "Valid until 7 August 2025"},
            # duplicate index — D2 must re-id one of these
            {"index": 17502, "name": "Legacy item A", "price": "R3.50", "promotion_price": "No promo",
             "retailer": "Shoprite", "image_url": PLACEHOLDER_IMAGE_URL, "promotion_valid": " "},
        ]
    )
