from flacx.cli import main

main()
