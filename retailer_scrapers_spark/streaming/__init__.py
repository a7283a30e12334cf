"""Structured Streaming variants of the frontier operators.

The reference is batch-daily (daily_scrape.py:107-112 via a Windows
service loop, scrape_service.py:24-30), so the epoch loop in
``plans.crawl`` is the primary execution mode; this package provides
the continuous-ingest variants for deployments where discovered URLs
arrive as a stream (e.g. a Kafka topic of outlinks).
"""
