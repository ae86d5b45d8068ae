from . import filters, topk, recall, quantize, evaluate, dedup  # noqa: F401
