"""Plans: the epoch-loop crawl driver and checkpoint catalog."""
