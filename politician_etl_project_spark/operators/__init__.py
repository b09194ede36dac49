"""Reusable engine operators: dynamic filters, dedup families, similarity
join / ANN search, upsert writers, pagination."""
