"""Host-side data pipeline: tokenizer, datasets, bucketing loader, preparation."""
