"""Crawl-round plan composition."""
