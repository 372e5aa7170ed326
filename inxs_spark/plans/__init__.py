"""Spark execution plans: extraction pipeline + resumable runner."""
