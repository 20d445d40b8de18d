from glad_tiles_pipeline_spark.plans.oracle import replay_oracle, oracle_state_df

__all__ = ["replay_oracle", "oracle_state_df"]
