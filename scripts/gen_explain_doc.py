"""Regenerate EXPLAIN.md (annotated physical plans). See git history of
EXPLAIN.md; run: python scripts/gen_explain_doc.py (the body lives inline in
round-1 history — kept as a stub pointer; the committed EXPLAIN.md is the
artifact)."""
