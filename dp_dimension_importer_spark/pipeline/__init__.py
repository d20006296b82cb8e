"""The reference's event-driven import pipeline, Spark-native.

Reference flow (handler/incoming_instance_handler.go:52-97):
NewInstance event → validate → fetch dimensions + instance → idempotent
instance-node create → per-batch dimension insert + code relationship +
code-order lookup + Dataset-API patch → bulk AddDimensions → observation
constraint → InstanceCompleted event.

Spark restatement (SURVEY.md §3.1): ``readStream → strict decode with
dead-letter → foreachBatch { validate; anti-join existing; derive
nodes/edges; broadcast-join code orders; build patch set; emit completion
}`` with checkpointing replacing the reference's commit-always offsets.
"""
