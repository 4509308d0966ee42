"""Microbenchmark + roofline harness (reference scripts/ analog)."""
