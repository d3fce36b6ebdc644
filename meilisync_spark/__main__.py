from meilisync_spark.cli import main

raise SystemExit(main())
