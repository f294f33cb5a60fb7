from truely_tpu.cli import main

raise SystemExit(main())
