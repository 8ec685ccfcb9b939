"""Device-mesh parallelism: batched problem solves over TPU slices."""
