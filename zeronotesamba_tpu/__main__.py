from zeronotesamba_tpu.cli import main

main()
