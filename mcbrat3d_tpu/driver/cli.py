"""Command-line entry point (placeholder until the driver layer lands)."""


def main():
    print("mcbrat3d-tpu: driver CLI not yet implemented")


if __name__ == "__main__":
    main()
