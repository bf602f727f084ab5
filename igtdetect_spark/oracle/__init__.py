"""Pure-Python single-node oracle implementing the reference semantics
(xigt/igtdetect) — the test oracle every Spark operator is compared against.

Nothing in here touches Spark; numpy + stdlib only. The reference's external
packages (freki, riples_classifier, sklearn) are not installed in this
sandbox, so the oracle *is* the executable specification, built from the
reference call sites and sample files catalogued in SURVEY.md.
"""
