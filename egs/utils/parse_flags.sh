# Minimal long-flag parser for recipe scripts (source after defining defaults).
# Accepts "--name value" pairs; "--some-flag" maps onto variable "some_flag".
# Our stand-in for the Kaldi parse_options.sh convention the reference recipes
# use (reference: egs/vcc20/vae1/run.sh:49).
while [ $# -gt 0 ]; do
    case "$1" in
        --*)
            name=$(echo "${1#--}" | tr '-' '_')
            if ! eval "[ \"\${${name}+set}\" = set ]"; then
                echo "$0: unknown flag $1" >&2
                exit 1
            fi
            # every flag takes a value (Kaldi parse_options convention —
            # booleans are "--flag true|false"); catch a missing value or a
            # following flag instead of mis-binding it
            if [ $# -lt 2 ]; then
                echo "$0: flag $1 expects a value" >&2
                exit 1
            fi
            case "$2" in
                --*)
                    echo "$0: flag $1 expects a value, got flag $2" >&2
                    exit 1
                    ;;
            esac
            eval "${name}=\"\$2\""
            shift 2
            ;;
        *)
            echo "$0: unexpected argument $1" >&2
            exit 1
            ;;
    esac
done
