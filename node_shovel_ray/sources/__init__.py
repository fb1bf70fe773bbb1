"""Sources & sinks beyond Ray Data's built-ins. The reference's transport
plugins (file/tcp/amqp/... , src/inputs/ src/outputs/) map onto batch reads
and partitioned writes (SURVEY.md §2.1/§2.6); this package holds the custom
ones — notably a fast vectorized JSONL sink (Ray's write_json is row-level)."""
