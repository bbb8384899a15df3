from simpledsp_tpu.cli import main

raise SystemExit(main())
