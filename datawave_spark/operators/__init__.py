"""Post-query DataFrame operators — DataWave's transform chain
(#GROUPBY, #UNIQUE, limit.fields, excerpts, discovery, facets) plus the
training-data-pipeline operators (dedup, similarity search, text
analysis) that a 100 TB corpus engine needs."""
