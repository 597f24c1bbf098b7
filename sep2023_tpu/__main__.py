from sep2023_tpu.cli import main

main()
