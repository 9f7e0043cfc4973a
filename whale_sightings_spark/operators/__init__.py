"""DataFrame -> DataFrame operators (SURVEY.md §2): validation split,
cleaning, spatial join, dim encoding, dedup, similarity, text."""
