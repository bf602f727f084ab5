"""End-to-end pipelines (detect, train) with checkpoint/resume."""
