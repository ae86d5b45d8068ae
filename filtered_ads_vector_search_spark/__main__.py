"""`python -m filtered_ads_vector_search_spark` — grid-search CLI entry."""

from .cli import main

main()
