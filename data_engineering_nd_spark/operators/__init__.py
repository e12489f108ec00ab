"""Pipeline operators: dedup, similarity search, text analysis, multimodal
plumbing, data quality. These extend the reference's surface with the
operations a large-scale training-data pipeline needs (driver north star,
BASELINE.json); each is a named, tested, composable DataFrame -> DataFrame
function plus a registered driver query."""
