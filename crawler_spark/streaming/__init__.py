"""Structured Streaming surfaces of the crawl engine.

The batch engine (engine.py) is the determinism-critical path — the
north_rule demands reproducible ordering and snapshot resume, which the
driver round loop gives directly. These streaming modules are the
continuous-operation counterparts a production deployment runs *alongside*
the round loop:

- ``metrics``: watermarked event-time windowed fetch metrics over the
  fetch-event firehose (late events tolerated up to the watermark delay);
- ``dedup``: stateful streaming URL-seen dedup via
  ``applyInPandasWithState`` — the streaming analog of the reference's
  visited map (engine/schedule.go:412-429).
"""
