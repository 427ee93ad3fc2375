"""Column-expression function surface (spans, sets, temporals, boxes, points).

Every public function takes and returns `pyspark.sql.Column` (str column
names are accepted and resolved with F.col). Nothing here collects or runs
jobs — these are pure logical-plan builders that Catalyst optimizes.
"""
