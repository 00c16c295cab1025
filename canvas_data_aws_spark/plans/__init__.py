from canvas_data_aws_spark.plans.registry import QUERIES, Query, all_queries, oracle_map, query_map

__all__ = ["QUERIES", "Query", "all_queries", "oracle_map", "query_map"]
