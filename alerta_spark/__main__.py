from alerta_spark.cli import main

raise SystemExit(main())
