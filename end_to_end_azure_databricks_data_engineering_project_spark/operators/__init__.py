"""Relational + pipeline operators: cleansing transforms, SCD1/SCD2 CDC
merges, data-quality expectations, dedup family, similarity search,
text analysis, multimodal plumbing."""
